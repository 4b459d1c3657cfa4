"""Storage policy for per-invocation materializations.

Every ``localCheckpoint`` in a query path uses ``DISK_ONLY`` blocks:
the default MEMORY_AND_DISK(deserialized) level parks each query's
materialized frames in the unified storage pool, and a long-lived
session running hundreds of queries accumulates enough protected
storage (spark.memory.storageFraction) to starve execution memory —
measured in r15 as a 2x slowdown of the memory-heavy set-similarity
joins late in a full-registry bench run. DISK_ONLY blocks live on
local disk (exactly where shuffle data already lives), cost a
sequential deserialize per re-read, and exert no storage-pool
pressure. Blocks are still freed by the ContextCleaner when the
invocation's DataFrames are garbage-collected; nothing persists
across runs.
"""

from pyspark.storagelevel import StorageLevel

DISK_ONLY = StorageLevel.DISK_ONLY
