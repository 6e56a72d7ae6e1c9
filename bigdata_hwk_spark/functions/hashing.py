"""Engine-portable 64-bit hashing.

Spark's builtin ``hash``/``xxhash64`` (Murmur3 / xxHash) have no DuckDB
equivalent, so oracle-checked operators that *depend on hash values*
(MinHash, SimHash, fingerprinting) use an md5-derived hash instead: both
engines md5 identically, and the first 15 hex chars (60 bits) convert to
the same non-negative BIGINT on both sides. md5 is slower than xxhash64
but runs JVM-side in whole-stage codegen; for a production deployment the
cheaper ``F.xxhash64`` is a drop-in swap (only the oracle needs md5).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# md5_hash64 values span exactly [0, 2**HASH_BITS): 15 hex chars = 60 bits,
# always non-negative. Anything deriving buckets from the hash's top bits
# (e.g. the shard-manifest prefix-sum bucketing) must shift within THIS
# domain, not a signed-64 one.
HASH_BITS = 60


def md5_hash64(col: Column) -> Column:
    """Spark: first 60 bits of md5(col) as a non-negative bigint."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def md5_hash64_sql(expr: str) -> str:
    """DuckDB SQL producing the identical value for the same input."""
    return f"('0x' || substr(md5({expr}), 1, 15))::BIGINT"
