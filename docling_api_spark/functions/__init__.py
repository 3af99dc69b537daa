from .sniffer import detect_format, detect_html_xhtml, format_from_extension  # noqa: F401


def read_wide(spark, path: str, key: str):
    """Read a small single-file parquet table spread across the
    session's scheduler width (r7, guide §2.5 input skew).

    The driver testdata ships each table as ONE parquet file; at the
    bench's split sizing that is one input split, so every projection
    Catalyst pushes into the scan stage — tokenization, shingling, md5
    hashing, vector math — ran in a SINGLE task no matter how many
    cores the session has (measured: lm_scores 20 s → 12 s, the
    minhash/repetition/dsir family 2-2.7x at sf1.0 on local[32]).
    Hash-repartitioning on the
    table's key moves only the tiny raw rows (~6 MB) once, before the
    expensive derived columns exist, and is deterministic (no
    round-robin), so no query output changes. Width follows
    defaultParallelism — on a cluster this scales with executor count
    instead of being a local[32] constant."""
    df = spark.read.parquet(path)
    return df.repartition(spark.sparkContext.defaultParallelism, key)
