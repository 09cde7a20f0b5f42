"""Identity helpers (ref: /root/reference/awswrangler/sts.py).

Local/cluster identity in place of AWS STS; on AWS the s3a/Glue
clients carry the real credentials, these are informational.
"""

from __future__ import annotations

import getpass
from typing import Any


def get_account_id(**_: Any) -> str:
    """Ref: awswrangler/sts.py:13 ``get_account_id``."""
    return "000000000000"


def get_current_identity_arn(**_: Any) -> str:
    """Ref: awswrangler/sts.py:36 ``get_current_identity_arn``."""
    return f"arn:local:sts::000000000000:user/{get_current_identity_name()}"


def get_current_identity_name(**_: Any) -> str:
    """Ref: awswrangler/sts.py:59 ``get_current_identity_name``."""
    try:
        return getpass.getuser()
    except Exception:  # noqa: BLE001
        return "unknown"
