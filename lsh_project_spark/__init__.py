"""lsh_project_spark — a PySpark-native near-duplicate detection & clustering engine.

A from-scratch reimplementation of the capabilities of maurerjo/LSH-Project
(cross-polytope LSH over feature vectors; see /root/reference/src/lsh.c,
/root/reference/src/main.cc) re-expressed Spark-first:

- feature vectors live in DataFrames (``id, features array<float>``),
- signatures are computed by batched numpy matmuls inside Arrow-vectorized
  ``mapInPandas`` UDFs (the reference's "bulked" path, src/main.cc:513-549,
  is exactly the Arrow record-batch execution model),
- hash tables are *exploded signature DataFrames* joined on (table, bucket)
  instead of open-addressing slabs (src/lsh.c:179-196),
- exact verification (src/lsh.c:851-877) is a vectorized pandas UDF,
- clustering is an iterative large-star/small-star connected-components
  DataFrame job (no reference analog; mandated by the dedup graft).

Everything here derives from public knowledge only: the Apache Spark API,
the reference repo's observable behavior, and published papers (FALCONN /
cross-polytope LSH: Andoni et al. 2015; MinHash: Broder 1997; SimHash:
Charikar 2002; winnowing: Schleimer et al. 2003; connected components:
Kiveris et al. 2014).
"""

__version__ = "0.1.0"
