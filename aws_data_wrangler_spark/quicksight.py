"""QuickSight analog (ref: /root/reference/awswrangler/quicksight/).

QuickSight is a managed BI service with no open-source analog in this
engine; the API surface is kept shape-compatible (same function names
and signatures as the reference's create/delete/describe/get_list
modules) so calling code ports, but operations raise
``NotImplementedError`` outside an AWS runtime. List operations
return empty lists so inventory-style code degrades gracefully.
"""

from __future__ import annotations

from typing import Any, Dict, List


def _unavailable(name: str) -> None:
    raise NotImplementedError(
        f"quicksight.{name} requires the managed QuickSight service; "
        "no open-source analog is provided."
    )


def create_athena_datasource(**_: Any) -> None:  # noqa: D103
    _unavailable("create_athena_datasource")


def create_athena_dataset(**_: Any) -> None:  # noqa: D103
    _unavailable("create_athena_dataset")


def create_ingestion(**_: Any) -> None:  # noqa: D103
    _unavailable("create_ingestion")


def delete_all_dashboards(**_: Any) -> None:  # noqa: D103
    _unavailable("delete_all_dashboards")


def delete_all_datasets(**_: Any) -> None:  # noqa: D103
    _unavailable("delete_all_datasets")


def delete_all_data_sources(**_: Any) -> None:  # noqa: D103
    _unavailable("delete_all_data_sources")


def describe_dashboard(**_: Any) -> Dict[str, Any]:  # noqa: D103
    _unavailable("describe_dashboard")
    return {}


def describe_data_source(**_: Any) -> Dict[str, Any]:  # noqa: D103
    _unavailable("describe_data_source")
    return {}


def describe_dataset(**_: Any) -> Dict[str, Any]:  # noqa: D103
    _unavailable("describe_dataset")
    return {}


def list_dashboards(**_: Any) -> List[Dict[str, Any]]:
    """Empty inventory outside AWS."""
    return []


def list_datasets(**_: Any) -> List[Dict[str, Any]]:
    """Empty inventory outside AWS."""
    return []


def list_data_sources(**_: Any) -> List[Dict[str, Any]]:
    """Empty inventory outside AWS."""
    return []


def list_groups(**_: Any) -> List[Dict[str, Any]]:
    """Empty inventory outside AWS."""
    return []


def list_users(**_: Any) -> List[Dict[str, Any]]:
    """Empty inventory outside AWS."""
    return []
