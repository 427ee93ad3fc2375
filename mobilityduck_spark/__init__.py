"""mobilityduck_spark — a PySpark-native temporal/spatiotemporal analytics engine.

Re-implements the query surface of the `mobilityduck` DuckDB extension
(MobilityDB/MEOS temporal types bound into SQL) as idiomatic PySpark:

- every temporal / span / set / box type is a transparent Spark SQL struct
  (never an opaque blob), so Catalyst sees inside values, columns stay
  columnar, and predicates participate in pushdown and join planning;
- every operator is a composable `pyspark.sql.Column` expression built from
  built-in (JVM-side, codegen'd) functions wherever semantics allow;
  Arrow-vectorized pandas UDFs are reserved for genuine geometry math;
- relational processing (scan/join/agg/sort) is plain Spark SQL, the role
  DuckDB plays for the reference.

See SURVEY.md for the full reference analysis and type mapping.
"""

__version__ = "0.1.0"

# Curated public surface — `from mobilityduck_spark import span, tpoint, ...`
from . import textio, types, wkt  # noqa: E402,F401
from .functions import box, polygon, span, temporal, tgeometry, tpoint  # noqa: E402,F401
from .functions import set_ as sets  # noqa: E402,F401
from .operators import (  # noqa: E402,F401
    dedup,
    multimodal,
    range_join,
    similarity,
    text,
    tpoint_pairs,
)
from .session import get_spark  # noqa: E402,F401
from .sqlapi import register_sql_functions  # noqa: E402,F401
