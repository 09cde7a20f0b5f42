"""QuickSight analog (ref: /root/reference/awswrangler/quicksight/).

QuickSight is a managed BI service with no open-source analog in this
engine; the full API surface of the reference (create/cancel/delete/
describe/get/list modules) is kept name-compatible so calling code
ports, but mutating/describing operations raise
``NotImplementedError`` outside an AWS runtime. List/get operations
return empty inventories so discovery-style code degrades gracefully.
"""

from __future__ import annotations

from typing import Any, Dict, List


def _unavailable(name: str) -> None:
    raise NotImplementedError(
        f"quicksight.{name} requires the managed QuickSight service; "
        "no open-source analog is provided."
    )


# ---- create (ref: quicksight/_create.py) ---------------------------------

def create_athena_data_source(**_: Any) -> None:  # noqa: D103
    _unavailable("create_athena_data_source")


def create_athena_dataset(**_: Any) -> None:  # noqa: D103
    _unavailable("create_athena_dataset")


def create_ingestion(**_: Any) -> None:  # noqa: D103
    _unavailable("create_ingestion")


# ---- cancel (ref: quicksight/_cancel.py) ---------------------------------

def cancel_ingestion(**_: Any) -> None:  # noqa: D103
    _unavailable("cancel_ingestion")


# ---- delete (ref: quicksight/_delete.py) ---------------------------------

def delete_dashboard(**_: Any) -> None:  # noqa: D103
    _unavailable("delete_dashboard")


def delete_data_source(**_: Any) -> None:  # noqa: D103
    _unavailable("delete_data_source")


def delete_dataset(**_: Any) -> None:  # noqa: D103
    _unavailable("delete_dataset")


def delete_template(**_: Any) -> None:  # noqa: D103
    _unavailable("delete_template")


def delete_all_dashboards(**_: Any) -> None:
    """No-op outside AWS (nothing to delete in an empty inventory)."""


def delete_all_data_sources(**_: Any) -> None:
    """No-op outside AWS."""


def delete_all_datasets(**_: Any) -> None:
    """No-op outside AWS."""


def delete_all_templates(**_: Any) -> None:
    """No-op outside AWS."""


# ---- describe (ref: quicksight/_describe.py) ------------------------------

def describe_dashboard(**_: Any) -> Dict[str, Any]:  # noqa: D103
    _unavailable("describe_dashboard")
    return {}


def describe_data_source(**_: Any) -> Dict[str, Any]:  # noqa: D103
    _unavailable("describe_data_source")
    return {}


def describe_data_source_permissions(**_: Any) -> Dict[str, Any]:  # noqa: D103
    _unavailable("describe_data_source_permissions")
    return {}


def describe_dataset(**_: Any) -> Dict[str, Any]:  # noqa: D103
    _unavailable("describe_dataset")
    return {}


def describe_ingestion(**_: Any) -> Dict[str, Any]:  # noqa: D103
    _unavailable("describe_ingestion")
    return {}


# ---- get/list (ref: quicksight/_get_list.py) ------------------------------

def _empty_list(**_: Any) -> List[Dict[str, Any]]:
    """Empty inventory outside AWS."""
    return []


list_dashboards = _empty_list
list_data_sources = _empty_list
list_datasets = _empty_list
list_group_memberships = _empty_list
list_groups = _empty_list
list_iam_policy_assignments = _empty_list
list_iam_policy_assignments_for_user = _empty_list
list_ingestions = _empty_list
list_templates = _empty_list
list_user_groups = _empty_list
list_users = _empty_list


def _not_found(kind: str, name: str) -> None:
    raise ValueError(f"{kind} {name} not found (empty inventory outside AWS)")


def get_dashboard_id(name: str, **_: Any) -> str:  # noqa: D103
    _not_found("dashboard", name)
    return ""


def get_dashboard_ids(name: str, **_: Any) -> List[str]:
    """Empty outside AWS."""
    return []


def get_data_source_arn(name: str, **_: Any) -> str:  # noqa: D103
    _not_found("data source", name)
    return ""


def get_data_source_arns(name: str, **_: Any) -> List[str]:
    """Empty outside AWS."""
    return []


def get_data_source_id(name: str, **_: Any) -> str:  # noqa: D103
    _not_found("data source", name)
    return ""


def get_data_source_ids(name: str, **_: Any) -> List[str]:
    """Empty outside AWS."""
    return []


def get_dataset_id(name: str, **_: Any) -> str:  # noqa: D103
    _not_found("dataset", name)
    return ""


def get_dataset_ids(name: str, **_: Any) -> List[str]:
    """Empty outside AWS."""
    return []


def get_template_id(name: str, **_: Any) -> str:  # noqa: D103
    _not_found("template", name)
    return ""


def get_template_ids(name: str, **_: Any) -> List[str]:
    """Empty outside AWS."""
    return []


def extract_athena_table_columns(database: str, table: str, **_: Any) -> List[Dict[str, str]]:
    """QuickSight physical-table column list from a catalog table
    (ref: awswrangler/quicksight/_utils.py ``extract_athena_table_columns``)
    — functional against the session catalog."""
    from aws_data_wrangler_spark import catalog
    from aws_data_wrangler_spark._data_types import athena2quicksight
    from aws_data_wrangler_spark.exceptions import InvalidArgument

    dtypes = catalog.get_table_types(database=database, table=table)
    if not dtypes:
        raise InvalidArgument(f"{database}.{table} does not exist")
    return [{"Name": n, "Type": athena2quicksight(t)} for n, t in dtypes.items()]


def extract_athena_query_columns(sql: str, **_: Any) -> List[Dict[str, str]]:
    """Column list of a SQL query via a LIMIT-0 plan (schema-only; no
    execution) — the reference runs the wrapped query on Athena and
    reads its metadata (ref: awswrangler/quicksight/_utils.py)."""
    from aws_data_wrangler_spark import athena
    from aws_data_wrangler_spark._data_types import athena2quicksight, spark2athena

    df = athena.read_sql_query(f"SELECT ds.* FROM ( {sql} ) ds LIMIT 0")
    return [
        {"Name": f.name, "Type": athena2quicksight(spark2athena(f.dataType))}
        for f in df.schema.fields
    ]
