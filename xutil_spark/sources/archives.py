"""Archive sources: zip / tar / tar.gz / gz scans (SURVEY §2.1).

Spark has no tar/zip source, so archives are scanned with the
``binaryFile`` reader and expanded member-by-member inside
``mapInPandas`` (Python ``zipfile``/``tarfile`` over ``io.BytesIO``) —
the reference's ``UncompressZip``/``UncompressTarGzip``/
``UncompresToByte`` (archive.go:42-136) as a distributed scan.  Plain
``.gz``/``.csv`` files go straight through ``spark.read.csv`` (built-in
codec inference, ≙ ``getReader`` csv.go:251-261).

Each member row carries (archive, member, mtime, size, content) —
the per-file lineage the reference records in InputInfo (csv.go:140).
"""

from __future__ import annotations

import io
import os
import tarfile
import zipfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEMBERS_SCHEMA = T.StructType([
    T.StructField("archive", T.StringType(), False),
    T.StructField("member", T.StringType(), False),
    T.StructField("size", T.LongType(), False),
    T.StructField("content", T.BinaryType(), False),
])

_TEXT_SUFFIXES = (".csv", ".txt", ".gz")  # archive.go:56-66 member filter


def _expand_zip(name: str, data: bytes) -> Iterator[tuple]:
    with zipfile.ZipFile(io.BytesIO(data)) as zf:
        for info in zf.infolist():
            if info.is_dir():
                continue
            if not info.filename.endswith(_TEXT_SUFFIXES):
                continue
            content = zf.read(info)
            if info.filename.endswith(".gz"):
                import gzip

                content = gzip.decompress(content)
            yield (name, info.filename, len(content), content)


def _expand_tar(name: str, data: bytes) -> Iterator[tuple]:
    mode = "r:gz" if name.endswith((".tar.gz", ".tgz")) else "r"
    with tarfile.open(fileobj=io.BytesIO(data), mode=mode) as tf:
        for info in tf:
            if not info.isfile():
                continue
            if not info.name.endswith(_TEXT_SUFFIXES):
                continue
            content = tf.extractfile(info).read()
            if info.name.endswith(".gz"):
                import gzip

                content = gzip.decompress(content)
            yield (name, info.name, len(content), content)


def read_archive_members(spark: SparkSession, path_glob: str) -> DataFrame:
    """Distributed archive expansion: binaryFile scan → mapInPandas.

    Suffix dispatch ≙ UncompresToByte (archive.go:115-136): .zip via
    zipfile, .tar/.tar.gz/.tgz via tarfile, .gz members gunzipped."""
    raw = spark.read.format("binaryFile").load(path_glob)

    def expand(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for r in b.itertuples(index=False):
                name = r.path
                data = bytes(r.content)
                if name.endswith(".zip"):
                    rows.extend(_expand_zip(name, data))
                elif name.endswith((".tar", ".tar.gz", ".tgz")):
                    rows.extend(_expand_tar(name, data))
                elif name.endswith(".gz"):
                    import gzip

                    content = gzip.decompress(data)
                    rows.append((name, os.path.basename(name[:-3]), len(content), content))
                else:
                    rows.append((name, os.path.basename(name), len(data), data))
            yield pd.DataFrame(
                rows, columns=["archive", "member", "size", "content"]
            )

    return raw.select("path", "content").mapInPandas(expand, schema=MEMBERS_SCHEMA)


def members_as_csv(
    spark: SparkSession, members: DataFrame, header: bool = True, sep: str = ","
) -> DataFrame:
    """Parse expanded CSV members into one DataFrame under the first
    header (≙ ParseZip's merge, csv.go:144-165), with per-member
    lineage columns retained."""

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            frames = []
            for r in b.itertuples(index=False):
                pdf = pd.read_csv(
                    io.BytesIO(bytes(r.content)), sep=sep,
                    header=0 if header else None, dtype=str,
                    keep_default_na=False,
                )
                pdf.insert(0, "_archive", r.archive)
                pdf.insert(1, "_member", r.member)
                frames.append(pdf)
            if frames:
                yield pd.concat(frames, ignore_index=True)

    # infer the output schema from the first member (driver-side peek —
    # dim-scale metadata only, never fact data)
    first = members.select("archive", "member", "content").limit(1).collect()
    if not first:
        raise ValueError("no members")
    probe = pd.read_csv(
        io.BytesIO(bytes(first[0]["content"])), sep=sep,
        header=0 if header else None, dtype=str, keep_default_na=False,
    )
    cols = ["_archive", "_member"] + [str(c) for c in probe.columns]
    schema = T.StructType([T.StructField(c, T.StringType(), True) for c in cols])
    return members.mapInPandas(parse, schema=schema)


def incremental_new_files(
    listing: DataFrame, ingested_log: DataFrame, key: str = "member"
) -> DataFrame:
    """Incremental ingest set = listed − already-loaded (the
    GetFTPFiles anti-join idiom, ftp.go:377-433)."""
    return listing.join(ingested_log.select(key).distinct(), on=key, how="left_anti")


def write_csv_split(
    df: DataFrame, path: str, max_records_per_file: int = 100000,
    sep: str = ",", header: bool = True,
) -> None:
    """CSV sink with row-count chunking ≙ CSVTools.FileMaxLines
    (csv.go:53-55, 216-247) via maxRecordsPerFile — no manual chunk
    loop, the committer handles atomicity."""
    (
        df.write.mode("overwrite")
        .option("header", str(header).lower())
        .option("sep", sep)
        .option("maxRecordsPerFile", max_records_per_file)
        .csv(path)
    )
