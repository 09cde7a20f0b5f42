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


class InvalidCompression(Exception):
    """Invalid compression format (ref: awswrangler/exceptions.py)."""


class InvalidDatabaseType(Exception):
    """Invalid warehouse/database type."""


class InvalidSchemaConvergence(Exception):
    """Incompatible schemas between appended datasets."""


class InvalidCtasApproachQuery(Exception):
    """Query shape not usable with the CTAS materialization path."""


class InvalidConfiguration(Exception):
    """Invalid engine configuration."""


class NoFilesFound(Exception):
    """No objects under the given prefix."""


class InvalidDataFrame(Exception):
    """DataFrame not usable for the requested operation."""


class RedshiftLoadError(Exception):
    """Warehouse COPY/load failure (reference name kept for parity)."""


class InvalidRedshiftDiststyle(Exception):
    """Invalid DISTSTYLE (warehouse DDL parity name)."""


class InvalidRedshiftDistkey(Exception):
    """Invalid DISTKEY (warehouse DDL parity name)."""


class InvalidRedshiftSortstyle(Exception):
    """Invalid SORTSTYLE (warehouse DDL parity name)."""


class InvalidRedshiftSortkey(Exception):
    """Invalid SORTKEY (warehouse DDL parity name)."""


class InvalidRedshiftPrimaryKeys(Exception):
    """Invalid primary-key spec (warehouse DDL parity name)."""
