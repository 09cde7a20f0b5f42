"""EMR analog (ref: /root/reference/awswrangler/emr.py).

The reference provisions EMR clusters and submits steps. The
Spark-native analog treats a *SparkSession* as the cluster: cluster
lifecycle maps to session lifecycle, steps are SQL/Python payloads
executed on the session, states mirror the EMR state machine. On a
real deployment the same step payloads are what you'd hand to
spark-submit on EMR/EKS; nothing here assumes local mode.
"""

from __future__ import annotations

import time
import uuid
from typing import Any, Dict, List, Optional

from pyspark.sql import SparkSession

from aws_data_wrangler_spark.exceptions import InvalidArgument
from aws_data_wrangler_spark.s3._fs import _active_spark

__all__ = [
    "create_cluster",
    "get_cluster_state",
    "terminate_cluster",
    "build_step",
    "build_spark_step",
    "submit_step",
    "submit_steps",
    "submit_spark_step",
    "get_step_state",
]

_CLUSTERS: Dict[str, Dict[str, Any]] = {}
_STEPS: Dict[str, Dict[str, Any]] = {}


def create_cluster(
    cluster_name: str = "spark-cluster",
    spark: Optional[SparkSession] = None,
    **pars: Any,
) -> str:
    """Ref: awswrangler/emr.py:389 ``create_cluster``. Returns cluster id."""
    cluster_id = f"j-{uuid.uuid4().hex[:12].upper()}"
    _CLUSTERS[cluster_id] = {
        "Name": cluster_name,
        "State": "WAITING",
        "Spark": _active_spark(spark),
        "Created": time.time(),
        "Pars": pars,
    }
    return cluster_id


def get_cluster_state(cluster_id: str, **_: Any) -> str:
    """Ref: awswrangler/emr.py:690 ``get_cluster_state``."""
    return _CLUSTERS[cluster_id]["State"]


def terminate_cluster(cluster_id: str, **_: Any) -> None:
    """Ref: awswrangler/emr.py:721 ``terminate_cluster``."""
    _CLUSTERS[cluster_id]["State"] = "TERMINATED"


def build_step(
    command: str,
    name: str = "my-step",
    action_on_failure: str = "CONTINUE",
    step_type: str = "sql",
    **_: Any,
) -> Dict[str, Any]:
    """Step payload. Ref: awswrangler/emr.py:832 ``build_step``."""
    return {
        "Name": name,
        "ActionOnFailure": action_on_failure,
        "Type": step_type,
        "Command": command,
    }


def build_spark_step(
    path: str,
    name: str = "my-spark-step",
    action_on_failure: str = "CONTINUE",
    **_: Any,
) -> Dict[str, Any]:
    """Spark-submit-style step for a python file at ``path``.
    Ref: awswrangler/emr.py:967 ``build_spark_step``."""
    return build_step(command=path, name=name, action_on_failure=action_on_failure, step_type="pyfile")


def submit_step(
    cluster_id: str,
    command: Optional[str] = None,
    step: Optional[Dict[str, Any]] = None,
    **kwargs: Any,
) -> str:
    """Execute a step on the cluster's session. Ref: awswrangler/emr.py:780."""
    if step is None:
        if command is None:
            raise InvalidArgument("either command or step is required")
        step = build_step(command=command, **kwargs)
    cluster = _CLUSTERS[cluster_id]
    if cluster["State"] == "TERMINATED":
        raise InvalidArgument(f"cluster {cluster_id} is terminated")
    spark: SparkSession = cluster["Spark"]
    step_id = f"s-{uuid.uuid4().hex[:12].upper()}"
    record = {"Id": step_id, "State": "RUNNING", **step}
    _STEPS[step_id] = record
    cluster["State"] = "RUNNING"
    try:
        if step["Type"] == "sql":
            record["Result"] = spark.sql(step["Command"])
        elif step["Type"] == "pyfile":
            with open(step["Command"], "r", encoding="utf-8") as handle:
                exec(compile(handle.read(), step["Command"], "exec"), {"spark": spark})  # noqa: S102
        else:
            raise InvalidArgument(f"unsupported step type {step['Type']}")
        record["State"] = "COMPLETED"
    except Exception as error:  # noqa: BLE001 - surfaced via state, like EMR
        record["State"] = "FAILED"
        record["Reason"] = str(error)
    finally:
        cluster["State"] = "WAITING"
    return step_id


def submit_steps(cluster_id: str, steps: List[Dict[str, Any]], **_: Any) -> List[str]:
    """Ref: awswrangler/emr.py:747 ``submit_steps``."""
    return [submit_step(cluster_id, step=step) for step in steps]


def submit_spark_step(cluster_id: str, path: str, **kwargs: Any) -> str:
    """Ref: awswrangler/emr.py:1037 ``submit_spark_step``."""
    return submit_step(cluster_id, step=build_spark_step(path, **kwargs))


def get_step_state(cluster_id: str, step_id: str, **_: Any) -> str:
    """Ref: awswrangler/emr.py:888 ``get_step_state``."""
    return _STEPS[step_id]["State"]


def submit_ecr_credentials_refresh(cluster_id: str, path: str, **_: Any) -> str:
    """ECR credential refresh is AWS-runtime-specific; recorded as a
    completed no-op step. Ref: awswrangler/emr.py:920."""
    step_id = f"s-{uuid.uuid4().hex[:12].upper()}"
    _STEPS[step_id] = {
        "Id": step_id, "State": "COMPLETED", "Name": "ecr-credentials-refresh",
        "Type": "noop", "Command": path,
    }
    return step_id
