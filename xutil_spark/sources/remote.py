"""Remote file connectors: FTP / SFTP sources and sinks with the
reference's listing, download, and tmp-rename-commit semantics
(`/root/reference/ftp.go:31-241`, `/root/reference/sftp.go:34-296`).

These are DRIVER-SIDE ingestion connectors, not distributed scans: the
reference uses them to stage files onto a gateway host before parsing
(`GetFTPFiles`, ftp.go:377-433); the Spark-side half of that pipeline —
listing-minus-loaded anti-join, archive parsing, snapshot commit — is
``sources/archives.py`` + ``plans/snapshot.py``.  The transport is a
small duck-typed surface so the connector logic (glob-directory
walking, LIST parsing, skip-vs-abort error policy, atomic tmp-rename
upload) is fully testable with an injected fake; the default FTP
transport is stdlib ``ftplib`` (real), and SFTP raises a clear error
unless a transport is injected (no paramiko in this environment).

Transport surface (duck-typed)::

    nlst(path) -> list[str]        # name listing
    dir(path) -> list[str]         # raw LIST lines
    size(path) -> int
    retr(remote, fileobj) -> None  # download into open binary file
    stor(local_path, remote) -> None
    rename(src, dst) -> None
    mkd(path) -> None
    quit() -> None
"""

from __future__ import annotations

import os
import posixpath
import re
from datetime import datetime


def parse_ls(line: str, now: datetime | None = None) -> list[str]:
    """Parse one LIST line → ``[name, type, size, time]`` (ftp.go:243-285
    ``ParsrLS``): 9-field unix ``ls -l`` rows ("Jan  2 15:04" gets the
    CURRENT year; "Jan 2 2006" is absolute) and 4-field windows-FTP
    rows ("MM-DD-YY HH:MMAM").  Unparseable rows → ``[]``."""
    now = now or datetime.now()
    arr = line.split()
    if len(arr) == 9:
        name, size = arr[8], arr[4]
        ftime = " ".join(arr[5:8])
        if ":" in arr[7]:
            try:
                t = datetime.strptime(ftime, "%b %d %H:%M")
                ftime = t.replace(year=now.year).strftime("%Y-%m-%d %H:%M")
            except ValueError:
                pass
        else:
            try:
                t = datetime.strptime(ftime, "%b %d %Y")
                ftime = t.strftime("%Y-%m-%d %H:%M")
            except ValueError:
                pass
        kind = {"-": "file", "d": "folder", "l": "link"}.get(arr[0][:1], "")
        return [name, kind, size, ftime]
    if len(arr) == 4:
        ftime = ""
        try:
            t = datetime.strptime(" ".join(arr[:2]), "%m-%d-%y %I:%M%p")
            ftime = t.strftime("%Y-%m-%d %H:%M")
        except ValueError:
            pass
        return [arr[3], "file", arr[2], ftime]
    return []


class FtplibTransport:
    """Stdlib ``ftplib`` transport — the real default for ``XFtp``."""

    def __init__(self, host: str, port: int, user: str, pwd: str,
                 passive: bool = True, timeout: float = 30.0):
        import ftplib

        self._ftp = ftplib.FTP()
        self._ftp.connect(host, port, timeout=timeout)
        self._ftp.login(user, pwd)
        self._ftp.set_pasv(passive)

    def nlst(self, path):
        return self._ftp.nlst(path)

    def dir(self, path):
        lines: list[str] = []
        self._ftp.dir(path, lines.append)
        return lines

    def size(self, path):
        try:
            return int(self._ftp.size(path) or 0)
        except Exception:
            return 0

    def retr(self, remote, fileobj, block_size: int = 819_200):
        self._ftp.retrbinary(f"RETR {remote}", fileobj.write, block_size)

    def stor(self, local_path, remote):
        with open(local_path, "rb") as fh:
            self._ftp.storbinary(f"STOR {remote}", fh)

    def rename(self, src, dst):
        self._ftp.rename(src, dst)

    def mkd(self, path):
        self._ftp.mkd(path)

    def quit(self):
        self._ftp.quit()


class XFtp:
    """FTP connector with ftp.go's listing and transfer semantics.

    * ``name_list()`` / ``info_list()``: each pattern whose DIRECTORY
      part contains ``*`` walks the tree level by level via NLST
      (ftp.go:84-147); LIST rows parse through :func:`parse_ls` and
      emit ``"dir/name,type,size,time"`` strings (ftp.go:135-144).
    * ``download_files``: per-file errors remove the partial local file
      and SKIP (the incremental-ingest loop retries next cycle);
      ``download_files_map`` ABORTS on first error — both policies are
      the reference's (ftp.go:149-186 vs 188-210).
    * ``upload_files(use_tmp=True)``: write ``<name>.tmp`` then rename —
      the atomic-commit idiom shared with ``plans/snapshot.py``.
    """

    def __init__(self, addr: str, user: str, pwd: str,
                 file_patterns: list[str] | None = None,
                 local_file_prefix: str = "", pasv: str = "PASV",
                 transport=None, now: datetime | None = None):
        self.addr = addr
        self.user = user
        self.pwd = pwd
        self.file_patterns = list(file_patterns or [])
        self.local_file_prefix = local_file_prefix
        self.pasv = pasv
        self.conn = transport
        self._now = now

    def connect(self) -> "XFtp":
        if self.conn is None:
            host, _, port = self.addr.partition(":")
            self.conn = FtplibTransport(
                host, int(port or 21), self.user, self.pwd,
                passive=self.pasv != "PORT")
        return self

    def logout(self) -> None:
        if self.conn is not None:
            self.conn.quit()

    def mkdir_p(self, path: str) -> None:
        """Recursive MKD, checking the parent's NLST first (ftp.go:52-66)."""
        parent, name = posixpath.split(path.rstrip("/"))
        full = posixpath.join(parent, name)
        if full in (self.conn.nlst(parent) or []):
            return
        try:
            self.conn.mkd(path)
        except Exception:
            if parent and parent not in ("/", "."):
                self.mkdir_p(parent)
                self.conn.mkd(path)

    def size(self, path: str) -> int:
        return self.conn.size(path)

    def _expand_dirs(self, pattern: str) -> list[str]:
        """Level-by-level NLST walk of a pattern whose directory part
        contains ``*`` (ftp.go:87-121)."""
        parts = pattern.split("/")
        star_prefixes = [
            "/".join(parts[: i + 1])
            for i, p in enumerate(parts) if "*" in p
        ]
        if not star_prefixes:
            return []
        fmaps = {star_prefixes[0]: self.conn.nlst(star_prefixes[0]) or []}
        for i, nowpath in enumerate(star_prefixes[1:-1]):
            lastpath = star_prefixes[i]
            xdir = nowpath.replace(lastpath, "")
            found: list[str] = []
            for fpath in fmaps[lastpath]:
                found.extend(
                    self.conn.nlst(posixpath.join(fpath, xdir.lstrip("/")))
                    or [])
            fmaps[nowpath] = found
        last = star_prefixes[-1]
        base = posixpath.basename(last)
        out = []
        # nil-map semantics (ftp.go:117-121): when the parent of the
        # final component is not itself a walked star prefix (a
        # literal dir sits between two stars) the reference finds
        # nothing — mirrored here with the empty default
        for fpath in fmaps.get(posixpath.dirname(last), []):
            out.append(posixpath.join(fpath, base))
        return out

    def _file_list(self, cmd: str) -> list[str]:
        files: list[str] = []
        for pattern in self.file_patterns:
            if "*" in posixpath.dirname(pattern):
                now_files = self._expand_dirs(pattern)
            else:
                now_files = [pattern]
            for v in now_files:
                xdir = posixpath.dirname(v)
                if cmd == "NLST":
                    for f in self.conn.nlst(v) or []:
                        files.append(posixpath.join(xdir, posixpath.basename(f)))
                else:
                    for line in self.conn.dir(v) or []:
                        ls = parse_ls(line, now=self._now)
                        if ls:
                            files.append(xdir + "/" + ",".join(ls))
        return files

    def name_list(self) -> list[str]:
        return self._file_list("NLST")

    def info_list(self) -> list[str]:
        return self._file_list("LIST")

    def download_files(self, files: list[str]) -> dict:
        """Download each file under ``local_file_prefix``; per-file
        errors remove the partial file and skip.  Returns
        ``{remote: local}`` for the successes."""
        dat: dict = {}
        prefix = self.local_file_prefix
        if not prefix:
            prefix = (self._now or datetime.now()).strftime("%Y%m%d%H%M%S") + "_"
        for remote in files:
            local = prefix + posixpath.basename(remote)
            try:
                with open(local, "wb") as fh:
                    self.conn.retr(remote, fh)
            except Exception:
                if os.path.exists(local):
                    os.remove(local)
                continue
            dat[remote] = local
        return dat

    def download_files_map(self, files: dict) -> dict:
        """Download remote→local pairs; ABORT on the first error,
        returning what completed (ftp.go:188-210)."""
        dat: dict = {}
        for remote, local in files.items():
            with open(local, "wb") as fh:
                self.conn.retr(remote, fh)
            dat[remote] = local
        return dat

    def upload_files(self, files: dict, use_tmp: bool = True) -> dict:
        """Upload local→remote pairs; ``use_tmp`` writes ``.tmp`` then
        renames (atomic commit).  Returns ``{local: error-or-None}``."""
        ret: dict = {}
        for local, remote in files.items():
            tmp = remote + ".tmp" if use_tmp else remote
            try:
                self.conn.stor(local, tmp)
                if use_tmp:
                    self.conn.rename(tmp, remote)
                ret[local] = None
            except Exception as exc:  # per-file status, keep going
                ret[local] = exc
        return ret

    def connect_and_download(self) -> dict:
        self.connect()
        try:
            return self.download_files(self.name_list())
        finally:
            self.logout()


class XSFtp(XFtp):
    """SFTP twin of :class:`XFtp` (sftp.go:34-296): same listing /
    download / tmp-rename-upload surface over an SFTP transport, plus
    ``file_exist`` / ``is_dir`` / ``remove_file`` / ``cmd``.

    No SSH library ships in this environment, so ``connect()`` without
    an injected transport raises with the dependency named — the
    connector logic itself is fully exercised by the fake-transport
    tests."""

    def connect(self) -> "XSFtp":
        if self.conn is None:
            try:
                import paramiko  # noqa: F401
            except ImportError as exc:
                raise NotImplementedError(
                    "XSFtp needs an injected transport or the optional "
                    "'paramiko' dependency (not available here); see "
                    "sftp.go:34-50 for the reference connect") from exc
            host, _, port = self.addr.partition(":")
            client = paramiko.SSHClient()
            client.set_missing_host_key_policy(paramiko.AutoAddPolicy())
            client.connect(host, int(port or 22), self.user, self.pwd)
            self.conn = _ParamikoTransport(client)
        return self

    def file_exist(self, path: str) -> bool:
        """Stat-based existence probe (sftp.go:64-70)."""
        try:
            self.conn.size(path)
            return True
        except Exception:
            return False

    def is_dir(self, path: str) -> bool:
        try:
            return bool(self.conn.dir(path))
        except Exception:
            return False

    def remove_file(self, path: str) -> None:
        self.conn.delete(path)

    def cmd(self, command: str) -> tuple:
        """Remote command execution (sftp.go:102-111) — transport-gated."""
        return self.conn.exec_command(command)


class _ParamikoTransport:
    """Adapter shaping a paramiko client to the transport surface."""

    def __init__(self, client):
        self._client = client
        self._sftp = client.open_sftp()

    def nlst(self, path):
        return [posixpath.join(path, n) for n in self._sftp.listdir(path)]

    def dir(self, path):
        out = []
        for a in self._sftp.listdir_attr(path):
            out.append(str(a.longname))
        return out

    def size(self, path):
        return int(self._sftp.stat(path).st_size)

    def retr(self, remote, fileobj):
        self._sftp.getfo(remote, fileobj)

    def stor(self, local_path, remote):
        self._sftp.put(local_path, remote)

    def rename(self, src, dst):
        self._sftp.rename(src, dst)

    def mkd(self, path):
        self._sftp.mkdir(path)

    def delete(self, path):
        self._sftp.remove(path)

    def exec_command(self, command):
        _, out, err = self._client.exec_command(command)
        return out.read().decode(), err.read().decode()

    def quit(self):
        self._sftp.close()
        self._client.close()


def ftp_file_list(spark, conn, rules: list):
    """Remote ``FtpFileList`` (sftp.go:299-329): for each (patterns,
    {rule_id: regex}) rule set, run the connector's ``info_list`` and
    push the rows through the same regex+TimeParse pipeline as the
    LOCAL listing variant (``archives.file_list_pattern``) — one Spark
    path for both local and remote listings, so the incremental-ingest
    anti-join composes unchanged.  ``conn`` is a connected
    :class:`XFtp` / :class:`XSFtp`.

    The regex matches the NAME field (before the first comma) but the
    emitted ``fname`` is the full ``"dir/name,type,size,time"`` info
    string, as in the reference.  Output: (rule_id, dtime, fname).

    Each rule set's regexes apply ONLY to that set's own listing —
    the reference iterates ``rawftpfiles = InfoList()`` per rule set
    (sftp.go:307-316); pooling every set's rows under every set's
    regexes would emit extra (rule_id, dtime, fname) rows whenever a
    regex happens to match another set's files, corrupting the
    incremental-ingest anti-join downstream."""
    import pandas as pd
    from pyspark.sql import functions as F

    from xutil_spark.sources.archives import file_list_pattern

    out = None
    for patterns, ids in rules:
        conn.file_patterns = list(patterns)
        rows = conn.info_list()
        listing = spark.createDataFrame(
            pd.DataFrame({"_info": pd.Series(rows, dtype="object")}),
            schema="_info string",
        ).withColumn("_name", F.split("_info", ",")[0])
        part = file_list_pattern(listing, list(ids.items()),
                                 fname_col="_name", emit_col="_info")
        out = part if out is None else out.unionByName(part)
    return out


# --------------------------------------------------------------- sqlldr


_ROWS_PAT = re.compile(rb"(\d+) Rows? successfully loaded")
_BAD_PAT = re.compile(rb"(\d+) Rows? not loaded due to data errors")


def sqlldr_log(logfile: str) -> tuple:
    """Extract (rows, badrows) from a sqlldr log (db.go:48-70)."""
    try:
        with open(logfile, "rb") as fh:
            src = fh.read()
    except OSError:
        return 0, 0
    rows = badrows = 0
    m = _ROWS_PAT.search(src)
    if m:
        rows = int(m.group(1))
    m = _BAD_PAT.search(src)
    if m:
        badrows = int(m.group(1))
    return rows, badrows


def sqlldr(timeflag: str, userid: str, data: str, control: str = "",
           baddir: str = ".", runner=None) -> tuple:
    """Bulk-load one data file via Oracle ``sqlldr`` and account for it
    (db.go:16-45): build the command line, run it, parse the log for
    loaded/bad row counts, then apply the reference's file-retention
    policy — success removes log+data; success-with-bad-rows keeps
    log+bad but removes data; failure raises with the tool output.

    ``runner(cmd) -> (output_bytes, returncode)`` injects the
    subprocess (tests use a fake that writes the log); the default
    shells out to a real ``sqlldr`` binary and raises a clear error if
    none is installed.  Returns ``(rows, badrows)``.

    Spark-side composition: write partitions with
    ``archives.write_csv_split`` (or ``df.write.csv``), then drive one
    ``sqlldr`` call per part file from the gateway host — the loader
    itself is single-host by design, exactly like the reference's."""
    if not control:
        control = f"{data}.ctl"
    base = os.path.basename(data)
    logfile = f"{baddir}/{base}.{timeflag}.log"
    badfile = f"{baddir}/{base}.{timeflag}.bad"
    cmd = (f"sqlldr userid={userid} data={data} control={control} "
           f"log={logfile} bad={badfile}")
    if runner is None:
        import shutil
        import subprocess

        if shutil.which("sqlldr") is None:
            raise NotImplementedError(
                "no sqlldr binary on PATH — inject runner= (the tests "
                "do) or install the Oracle client")

        def runner(c):
            p = subprocess.run(["bash", "-c", c], capture_output=True)
            return p.stdout + p.stderr, p.returncode

    out, rc = runner(cmd)
    rows, badrows = sqlldr_log(logfile)
    if rc == 0:
        for p in (logfile, data):
            if os.path.exists(p):
                os.remove(p)
    elif rows > 0:
        if os.path.exists(data):
            os.remove(data)
    else:
        raise RuntimeError(out.decode() if isinstance(out, bytes) else str(out))
    return rows, badrows
