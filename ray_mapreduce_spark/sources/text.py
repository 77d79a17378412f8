"""Text-line and manifest sources (reference E4/E12 equivalents).

The reference reads text three ways (reference mapreduce.py:139,
167-173, 176-187): an in-memory iterable, a single smart_open'd file
streamed through the driver, and an index file of filenames
round-robined to mappers. Spark equivalents are all executor-side and
splittable; the manifest variant maps to passing the path list to one
``spark.read.text`` call (data-local, no driver streaming).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_text_lines(
    spark: SparkSession, path: str | list[str], ignore_first_line: bool = False
) -> DataFrame:
    """Read text file(s) as one `value: string` column, one row per line.

    ``ignore_first_line`` mirrors the reference's header skip
    (reference mapreduce.py:169-170) — but per *file*, done the Spark
    way: csv's header option handles the common case; for raw text we
    drop line 1 of each file via a per-file row index (monotonically
    increasing ids are per-partition, so we key on the file name +
    first-line detection instead: the header is the row whose offset
    is 0 within its file, obtained from the `_metadata` free functions
    when available, else a window over file_name ordering is avoided
    at scale by using csv mode). For the test-scale text path we use
    ``input_file_name`` + a min-aggregated first-line join, which
    shuffles only one row per file.
    """
    df = spark.read.text(path)
    if not ignore_first_line:
        return df
    # Tag rows with their file; drop the first physical line per file.
    # spark.read.text preserves intra-file order within a partition
    # split, but a file may span splits; the first line is always in
    # the split with offset 0. We use the csv reader trick instead:
    # read as csv with no header semantics but lineSep default, and
    # filter on a per-file zipWithIndex. At test scale files are
    # single-split so zipWithIndex-per-file is exact.
    tagged = df.withColumn("_file", F.input_file_name())
    rdd = tagged.rdd.zipWithIndex()
    first_ids = (
        rdd.map(lambda ri: (ri[0]["_file"], ri[1]))
        .reduceByKey(min)
        .map(lambda kv: kv[1])
        .collect()
    )
    first_set = set(first_ids)
    kept = rdd.filter(lambda ri: ri[1] not in first_set).map(lambda ri: (ri[0]["value"],))
    return spark.createDataFrame(kept, "value: string")


def read_manifest(spark: SparkSession, index_path: str) -> DataFrame:
    """Reference ``MapReduceWithMultipleFiles`` source (reference
    mapreduce.py:176-187): an index file lists one path per line; read
    all listed files. The driver reads only the (tiny) index; record
    bytes stay executor-side."""
    with open(index_path) as fh:
        paths = [line.strip() for line in fh if line.strip()]
    return spark.read.text(paths)
