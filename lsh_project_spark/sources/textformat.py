"""The reference's text interchange format, as a Spark source/sink.

Format (observed from /root/reference/src/data_handling.h:18-50 and shared
by the FALCONN harness, falconn/random_benchmark.cc:47-74): a whitespace
text file with a header line ``n d`` followed by ``n`` rows of ``d`` floats.
Kept for golden-fixture interchange with the compiled reference binary
(SURVEY.md §5.2 stretch goal).

The distributed reader maps the file into (id, features) rows; the writer
collects through toLocalIterator to keep driver memory bounded (the format
itself is single-file and inherently serial — it exists for small-n parity
fixtures, not production I/O, which is Parquet).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession


def save_vectors_text(df: DataFrame, path: str, id_col: str = "id",
                      vec_col: str = "features") -> int:
    """Write (id, features) ordered by id to the reference text format."""
    rows = df.select(id_col, vec_col).orderBy(id_col).toLocalIterator()
    n = 0
    buf = []
    dim = None
    for r in rows:
        vec = r[vec_col]
        if dim is None:
            dim = len(vec)
        buf.append(" ".join(f"{float(x):.9g}" for x in vec))
        n += 1
    with open(path, "w") as f:
        f.write(f"{n} {dim}\n")
        for line in buf:
            f.write(line + "\n")
    return n


def load_vectors_text(spark: SparkSession, path: str) -> DataFrame:
    """Read the reference text format -> (id long, features array<float>),
    ids assigned by file row order (the reference's implicit ids)."""
    with open(path) as f:
        header = f.readline().split()
        n, d = int(header[0]), int(header[1])
        data = np.loadtxt(f, dtype=np.float32, max_rows=n).reshape(n, d)
    rows = [(i, [float(x) for x in data[i]]) for i in range(n)]
    return spark.createDataFrame(rows, "id long, features array<float>")
