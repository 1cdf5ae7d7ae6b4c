"""Data sources: parquet/csv/json files, JDBC databases, SQLite files.

Parity with the reference's adapter layer
(`dbsurveyor-core/src/adapters/{postgres,mysql,sqlite,mongodb}`): each
adapter's job — connect, collect schema, sample — maps here onto Spark
readers plus the survey queries (which run on ANY DataFrame regardless of
source).
"""

from .documents import DocumentLakeSource  # noqa: F401
from .files import read_csv, read_json, read_parquet  # noqa: F401
from .jdbc import JdbcSource  # noqa: F401
from .sqlite import SqliteSource  # noqa: F401
from .typemap import (  # noqa: F401
    map_mysql_type,
    map_postgres_type,
    map_referential_action,
    unified_to_spark_ddl,
)
