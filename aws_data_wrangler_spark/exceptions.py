"""Exceptions (ref: /root/reference/awswrangler/exceptions.py)."""


class UndetectedType(Exception):
    """Undetected data type."""


class UnsupportedType(Exception):
    """Unsupported data type."""


class InvalidArgument(Exception):
    """Invalid argument."""


class InvalidArgumentValue(Exception):
    """Invalid argument value."""


class InvalidArgumentType(Exception):
    """Invalid argument type."""


class InvalidArgumentCombination(Exception):
    """Invalid argument combination."""


class InvalidTable(Exception):
    """Invalid table name."""


class QueryFailed(Exception):
    """Query failed."""


class QueryCancelled(Exception):
    """Query cancelled."""


class EmptyDataFrame(Exception):
    """Empty DataFrame."""


class InvalidConnection(Exception):
    """Invalid database connection."""


class ServiceApiError(Exception):
    """A (stubbed) cloud service API error."""
