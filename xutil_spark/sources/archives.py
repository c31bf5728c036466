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

# archive.go:56-66 member filter + csv.go:264-277 XML dispatch suffixes
_TEXT_SUFFIXES = (".csv", ".txt", ".gz", ".xml")


def skip_bom(data: bytes) -> bytes:
    """Strip a leading Unicode BOM (file.go:136-194), reference quirks
    preserved exactly:

    * UTF-32 BOMs (4 bytes) checked first, stripped when len >= 4;
    * UTF-8 BOM stripped when len > 2;
    * UTF-16 BOMs stripped ONLY when the payload is EXACTLY 2 bytes —
      the reference uses ``len(file) == 2`` (not >=), so real UTF-16
      files keep their BOM; replicated for parity (documented bug).
    """
    if len(data) >= 4 and data[:4] in (b"\x00\x00\xfe\xff", b"\xff\xfe\x00\x00"):
        return data[4:]
    if len(data) > 2 and data[:3] == b"\xef\xbb\xbf":
        return data[3:]
    if len(data) == 2 and data[:2] in (b"\xfe\xff", b"\xff\xfe"):
        return data[2:]
    return data


def default_xml_to_rows(xml_data: bytes) -> list[list[str]]:
    """Default ``XMLToCSV`` hook (the reference leaves it caller-
    supplied, csv.go:35): flat record documents — every repeated child
    of the root is a row, its child elements are columns; first row is
    the header from the first record's tags."""
    import xml.etree.ElementTree as ET

    root = ET.fromstring(xml_data.decode("utf-8"))
    rows: list[list[str]] = []
    header: list[str] | None = None
    for rec in root:
        if header is None:
            header = [ch.tag for ch in rec]
            rows.append(header)
        rows.append([(rec.find(tag).text or "") if rec.find(tag) is not None else ""
                     for tag in header])
    return rows


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


def _member_to_pdf(member: str, content: bytes, sep: str, header: bool,
                   encoding: str | None, xml_to_rows) -> pd.DataFrame:
    """One member → string DataFrame: XML members via the ``XMLToCSV``
    hook (csv.go:264-270 dispatch), everything else as charset-decoded
    CSV (``CSVBytes``, archive.go:139-169; BOM skipped first)."""
    content = skip_bom(content)
    if member.endswith((".xml", ".xml.gz")):
        rows = (xml_to_rows or default_xml_to_rows)(content)
        if not rows:
            return pd.DataFrame()
        if header:
            return pd.DataFrame(rows[1:], columns=[str(c) for c in rows[0]])
        return pd.DataFrame(rows)
    text = content.decode(encoding or "utf-8")
    return pd.read_csv(
        io.StringIO(text), sep=sep,
        header=0 if header else None, dtype=str, keep_default_na=False,
    )


_PROBE_BYTES = 65536


def _probe_columns(member: str, head: bytes, sep: str, header: bool,
                   encoding: str | None, xml_to_rows,
                   full_content=None) -> list[str]:
    """Output column names from the leading bytes of the first member.

    CSV: parse just the header line (or count the first row's fields
    when ``header=False``).  XML with the DEFAULT hook: incremental
    ``iterparse`` until the first record element closes — its child
    tags are the header; truncation past that point is irrelevant.
    XML with a CUSTOM hook: no partial protocol → ``full_content()``
    fallback (the only path that collects a whole member)."""
    head = skip_bom(head)
    if member.endswith((".xml", ".xml.gz")):
        if xml_to_rows is not None:
            rows = xml_to_rows(full_content())
            return [str(c) for c in rows[0]] if header and rows else (
                [str(i) for i in range(len(rows[0]))] if rows else [])
        import xml.etree.ElementTree as ET

        tags: list[str] = []
        depth = 0
        try:
            for ev, el in ET.iterparse(io.BytesIO(head), events=("start", "end")):
                if ev == "start":
                    depth += 1
                else:
                    if depth == 2:  # first record element closed
                        tags = [ch.tag for ch in el]
                        break
                    depth -= 1
        except ET.ParseError:
            if not tags and full_content is not None:
                rows = default_xml_to_rows(skip_bom(full_content()))
                tags = [str(c) for c in rows[0]] if rows else []
        if not header:
            return [str(i) for i in range(len(tags))]
        return [str(t) for t in tags]
    text = head.decode(encoding or "utf-8", errors="ignore")
    probe = pd.read_csv(
        io.StringIO(text), sep=sep,
        header=0 if header else None, dtype=str, keep_default_na=False,
        nrows=1,
    )
    return [str(c) for c in probe.columns]


def members_as_csv(
    spark: SparkSession, members: DataFrame, header: bool = True, sep: str = ",",
    encoding: str | None = None, xml_to_rows=None,
) -> DataFrame:
    """Parse expanded members into one DataFrame under the first header
    (≙ ParseZip's merge, csv.go:144-165), with per-member lineage
    columns retained.  ``encoding`` decodes legacy charsets (e.g.
    ``"gbk"`` ≙ the mahonia decoder in CSVBytes, archive.go:139-169);
    ``xml_to_rows`` is the ``XMLToCSV`` hook for ``.xml``/``.xml.gz``
    members (csv.go:35, 264-270) — defaults to the flat-record parser."""

    # infer the output schema from the FIRST member's HEADER only: the
    # probe ships just the leading bytes of one member through the
    # driver (a 2 GB first member costs 64 KB here, not 2 GB).  XML
    # members with a CUSTOM row hook can't be probed partially — only
    # that case falls back to the full first-member collect.
    first_meta = members.select(
        "member", F.substring("content", 1, _PROBE_BYTES).alias("head")
    ).limit(1).collect()
    if not first_meta:
        raise ValueError("no members")
    data_cols = _probe_columns(
        first_meta[0]["member"], bytes(first_meta[0]["head"]), sep, header,
        encoding, xml_to_rows,
        full_content=lambda: bytes(
            members.select("content").limit(1).collect()[0]["content"]
        ),
    )
    cols = ["_archive", "_member"] + data_cols

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            frames = []
            for r in b.itertuples(index=False):
                pdf = _member_to_pdf(r.member, bytes(r.content), sep, header,
                                     encoding, xml_to_rows)
                if pdf.empty:
                    continue
                # first-header-wins POSITIONAL merge (csv.go:144-165:
                # every member's header line drops, data rows append
                # under the first header by position — not by name);
                # short rows fill '', extra trailing columns drop
                pdf = pdf.iloc[:, : len(data_cols)]
                pdf.columns = data_cols[: pdf.shape[1]]
                for missing in data_cols[pdf.shape[1]:]:
                    pdf[missing] = ""
                pdf = pdf[data_cols]
                pdf.insert(0, "_archive", r.archive)
                pdf.insert(1, "_member", r.member)
                frames.append(pdf)
            if frames:
                yield pd.concat(frames, ignore_index=True)

    schema = T.StructType([T.StructField(c, T.StringType(), True) for c in cols])
    return members.mapInPandas(parse, schema=schema)


def row_kv_select(
    df: DataFrame, kv: dict[str, str] | None = None,
    outhead: list[str] | None = None, fill: str = "",
) -> DataFrame:
    """Case-insensitive rename-map projection: the reference's column-
    mapping surface (``RowReOrder`` csv.go:281-291, ``RowKVind``
    csv.go:294-313, ``RowsKVFile`` csv.go:315-383) as one declarative
    select.

    Each input column resolves to kv[lower(name)] if present, else its
    own lowered name (later input columns win name collisions, matching
    the Go map build); ``outhead`` gives the output order and any
    unresolvable output column fills with ``fill`` (the RowReOrder
    ``ind < 0`` branch).  ``outhead=None`` keeps the input order."""
    kv_l = {k.lower(): v.lower() for k, v in (kv or {}).items()}
    colmap: dict[str, str] = {}
    for c in df.columns:
        cl = c.lower()
        colmap[kv_l.get(cl, cl)] = c
    if outhead is None:
        outhead = list(colmap)
    return df.select(*[
        (F.col(colmap[o.lower()]) if o.lower() in colmap else F.lit(fill))
        .alias(o)
        for o in outhead
    ])


def apply_value_processor(
    df: DataFrame, fn, columns: list[str] | None = None,
) -> DataFrame:
    """``ValueProcessor`` hook (csv.go:36, applied per parsed value in
    ParseZip): one Column→Column transform over every string column
    (or an explicit subset) in a single projection — the declarative
    form of the reference's per-cell string hook."""
    targets = columns if columns is not None else [
        f.name for f in df.schema.fields if f.dataType.simpleString() == "string"
    ]
    tset = set(targets)
    return df.select(*[
        fn(F.col(c)).alias(c) if c in tset else F.col(c) for c in df.columns
    ])


def rows_kv_file(
    df: DataFrame, path: str, kv: dict[str, str] | None = None,
    outhead: list[str] | None = None, sep: str = ",", header: bool = True,
    max_records_per_file: int = 100000,
) -> None:
    """``RowsKVFile`` (csv.go:315-383): rename-map reorder + CSV sink in
    one call — ``row_kv_select`` projection then the chunked CSV writer
    (``outheadKeep`` ≙ header, ``FileMaxLines`` ≙ max_records_per_file)."""
    write_csv_split(
        row_kv_select(df, kv, outhead), path,
        max_records_per_file=max_records_per_file, sep=sep, header=header,
    )


def file_lines_count(spark: SparkSession, path_glob: str) -> DataFrame:
    """Per-file line counts + implicit total (``FileLinesCount`` /
    ``FilePatternLinesCount``, file.go:23-58) as a distributed text
    scan: one row per file (fname, n_lines).  Go counts delimiter-
    terminated chunks plus a trailing partial line — identical to
    Spark's text-line semantics for '\\n'."""
    return (
        spark.read.text(path_glob)
        .select(F.input_file_name().alias("fname"))
        .groupBy("fname")
        .agg(F.count(F.lit(1)).alias("n_lines"))
    )


def file_head(spark: SparkSession, path: str, sep: str = ",") -> list[str]:
    """First line of a file split on ``sep`` (``FileHead``,
    file.go:398-409).  Driver-side single-row read (header metadata)."""
    rows = spark.read.text(path).limit(1).collect()
    if not rows:
        return []
    return rows[0]["value"].split(sep)


def file_list_pattern(
    listing: DataFrame, rules: list[tuple[str, str]], fname_col: str = "fname",
    emit_col: str | None = None,
) -> DataFrame:
    """FTP-listing pattern match + embedded-timestamp extraction
    (``FtpFileList``, ftp.go:287-319): for each (rule_id, regex) rule,
    keep files whose name captures ONE group, parse the capture with the
    TimeParse ladder; unparseable timestamps yield '' (the reference's
    error branch).  Output: (rule_id, dtime, fname) — one row per
    (rule, matching file).  ``emit_col`` names the column emitted as
    ``fname`` when it differs from the matched one (the remote variant
    matches on the NAME field but emits the full info string,
    sftp.go:317-323)."""
    from xutil_spark.operators.relational import time_parse

    parts = []
    for rule_id, pattern in rules:
        cap = F.regexp_extract(F.col(fname_col), pattern, 1)
        parsed = time_parse(cap)
        parts.append(
            listing.filter(cap != "").select(
                F.lit(rule_id).alias("rule_id"),
                F.coalesce(
                    F.date_format(parsed, "yyyy-MM-dd HH:mm:ss"), F.lit("")
                ).alias("dtime"),
                F.col(emit_col or fname_col).alias("fname"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


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


def file_copy(src: str, dest: str) -> None:
    """Recursive copy preserving modes and symlinks (file.go:323-396
    ``FileCopy``/``filecopy``/``dircopy``/``linkcopy``): symlinks are
    re-created pointing at the same target, directories copy
    recursively and restore the original dir mode afterwards, plain
    files create parent dirs and carry the source mode."""
    import shutil

    st = os.lstat(src)
    if os.path.islink(src):
        os.symlink(os.readlink(src), dest)
        return
    if os.path.isdir(src):
        os.makedirs(dest, exist_ok=True)
        try:
            for name in sorted(os.listdir(src)):
                file_copy(os.path.join(src, name), os.path.join(dest, name))
        finally:
            os.chmod(dest, st.st_mode)
        return
    os.makedirs(os.path.dirname(dest) or ".", exist_ok=True)
    shutil.copyfile(src, dest)
    os.chmod(dest, st.st_mode)


def is_files_exist(paths: list) -> None:
    """Validate that every path is an existing regular FILE; raises
    ``FileNotFoundError`` naming all offenders, joined with "," and
    suffixed " HasError" (file.go:61-76 ``IsFilesExist``)."""
    bad = [p for p in paths if not os.path.isfile(p)]
    if bad:
        raise FileNotFoundError(",".join(bad) + " HasError")


def is_dirs_exist(paths: list, create: bool = False) -> None:
    """Validate that every path is an existing DIRECTORY; with
    ``create=True`` missing ones are created (mkdir -p) and only
    creation failures count (file.go:78-98 ``IsDirsExist``)."""
    bad = []
    for p in paths:
        if os.path.isdir(p):
            continue
        if create:
            try:
                os.makedirs(p, exist_ok=True)
            except OSError:
                bad.append(p)
        else:
            bad.append(p)
    if bad:
        raise FileNotFoundError(",".join(bad) + " HasError")
