"""FTP/SFTP connector + sqlldr sink semantics (driver-side, no Spark).

The transports are injected fakes, so every behavior the reference
implements over a live server — glob-directory walking, LIST parsing,
skip-vs-abort download policies, atomic tmp-rename upload, sqlldr log
accounting and file retention — is pinned without any network.
"""

import os
from datetime import datetime

import pytest

from xutil_spark.sources.archives import file_copy, is_dirs_exist, is_files_exist
from xutil_spark.sources.remote import XFtp, XSFtp, parse_ls, sqlldr, sqlldr_log

_NOW = datetime(2026, 8, 20, 12, 0)


class FakeTransport:
    """Directory-tree-backed transport recording every operation."""

    def __init__(self, tree, files=None, fail_retr=()):
        self.tree = tree          # dir -> list of child paths
        self.files = files or {}  # path -> bytes
        self.fail_retr = set(fail_retr)
        self.ops = []

    def nlst(self, path):
        self.ops.append(("nlst", path))
        return self.tree.get(path.rstrip("/"), [])

    def dir(self, path):
        self.ops.append(("dir", path))
        return self.tree.get("LIST:" + path, [])

    def size(self, path):
        if path not in self.files:
            raise FileNotFoundError(path)
        return len(self.files[path])

    def retr(self, remote, fileobj):
        self.ops.append(("retr", remote))
        if remote in self.fail_retr:
            raise IOError("boom")
        fileobj.write(self.files[remote])

    def stor(self, local_path, remote):
        with open(local_path, "rb") as fh:
            self.files[remote] = fh.read()
        self.ops.append(("stor", remote))

    def rename(self, src, dst):
        self.files[dst] = self.files.pop(src)
        self.ops.append(("rename", src, dst))

    def mkd(self, path):
        self.ops.append(("mkd", path))

    def delete(self, path):
        self.files.pop(path)

    def quit(self):
        self.ops.append(("quit",))


def test_parse_ls_unix_and_windows_formats():
    # the two formats documented at ftp.go:244-246
    unix_recent = "-rwxrwxrwx    1 501      510       5102081 Oct 09 17:23 pmchk.out"
    unix_dated = "drwxrwxr-x    5 577      554          4096 May 10  2019 pm"
    windows = "06-29-22  01:31PM              1383076 NK_Kpi4G_Plmn_202206291315.zip"
    assert parse_ls(unix_recent, now=_NOW) == [
        "pmchk.out", "file", "5102081", "2026-10-09 17:23"]
    assert parse_ls(unix_dated, now=_NOW) == [
        "pm", "folder", "4096", "2019-05-10 00:00"]
    assert parse_ls(windows, now=_NOW) == [
        "NK_Kpi4G_Plmn_202206291315.zip", "file", "1383076",
        "2022-06-29 13:31"]
    assert parse_ls("garbage line", now=_NOW) == []


def _glob_tree():
    # NLST of "/data/*" lists the matching dirs; NLST of a
    # "<dir>/*.csv" glob lists the matching files (server-side glob,
    # the ftp4go behavior the reference drives)
    return {
        "/data/*": ["/data/a", "/data/b"],
        "/data/a/*.csv": ["/data/a/f1.csv"],
        "/data/b/*.csv": ["/data/b/f2.csv", "/data/b/f3.csv"],
    }


def test_name_list_expands_star_directories():
    t = FakeTransport(_glob_tree())
    ftp = XFtp("h:21", "u", "p", file_patterns=["/data/*/*.csv"],
               transport=t, now=_NOW)
    got = sorted(ftp.name_list())
    assert got == ["/data/a/f1.csv", "/data/b/f2.csv", "/data/b/f3.csv"]


def test_name_list_literal_dir_between_stars_finds_nothing():
    """ftp.go:117-121 nil-map semantics: a literal directory between
    two star components defeats the walk — pinned, not 'fixed'."""
    t = FakeTransport(_glob_tree())
    ftp = XFtp("h:21", "u", "p", file_patterns=["/data/*/in/*.csv"],
               transport=t, now=_NOW)
    assert ftp.name_list() == []


def test_info_list_emits_dir_and_parsed_fields():
    tree = {
        "LIST:/logs/x.log": [
            "-rw-r--r--    1 u        g            1234 Oct 09 17:23 x.log"],
    }
    ftp = XFtp("h:21", "u", "p", file_patterns=["/logs/x.log"],
               transport=FakeTransport(tree), now=_NOW)
    assert ftp.info_list() == ["/logs/x.log,file,1234,2026-10-09 17:23"]


def test_download_files_skips_failures_and_cleans_partials(tmp_path):
    files = {"/in/a.csv": b"AAA", "/in/b.csv": b"BBB"}
    t = FakeTransport({}, files=files, fail_retr={"/in/b.csv"})
    ftp = XFtp("h:21", "u", "p", transport=t,
               local_file_prefix=str(tmp_path) + "/dl_")
    got = ftp.download_files(["/in/a.csv", "/in/b.csv"])
    assert got == {"/in/a.csv": str(tmp_path) + "/dl_a.csv"}
    assert open(got["/in/a.csv"], "rb").read() == b"AAA"
    assert not os.path.exists(str(tmp_path) + "/dl_b.csv")  # partial removed


def test_download_files_map_aborts_on_error(tmp_path):
    files = {"/in/a.csv": b"AAA"}
    t = FakeTransport({}, files=files, fail_retr={"/in/missing.csv"})
    ftp = XFtp("h:21", "u", "p", transport=t)
    with pytest.raises(Exception):
        ftp.download_files_map({
            "/in/a.csv": str(tmp_path / "a.csv"),
            "/in/missing.csv": str(tmp_path / "m.csv"),
        })


def test_upload_files_commits_via_tmp_rename(tmp_path):
    local = tmp_path / "out.csv"
    local.write_bytes(b"xyz")
    t = FakeTransport({})
    ftp = XFtp("h:21", "u", "p", transport=t)
    ret = ftp.upload_files({str(local): "/out/final.csv"}, use_tmp=True)
    assert ret == {str(local): None}
    assert t.files["/out/final.csv"] == b"xyz"
    # the wire order IS the atomicity story: stor to .tmp, then rename
    assert [op for op in t.ops if op[0] in ("stor", "rename")] == [
        ("stor", "/out/final.csv.tmp"),
        ("rename", "/out/final.csv.tmp", "/out/final.csv")]


def test_sftp_gates_without_transport_and_works_with_one(tmp_path):
    with pytest.raises(NotImplementedError):
        XSFtp("h:22", "u", "p").connect()
    t = FakeTransport({}, files={"/r/f.bin": b"Z"})
    s = XSFtp("h:22", "u", "p", transport=t)
    assert s.file_exist("/r/f.bin") and not s.file_exist("/r/nope")
    s.remove_file("/r/f.bin")
    assert not s.file_exist("/r/f.bin")


# ---------------------------------------------------------------- sqlldr


def _fake_runner(log_text, rc):
    def run(cmd):
        # the command names the log file after log= — write it there
        log = [p.split("=", 1)[1] for p in cmd.split() if p.startswith("log=")][0]
        with open(log, "w") as fh:
            fh.write(log_text)
        return b"out", rc
    return run


def test_sqlldr_success_removes_log_and_data(tmp_path):
    data = tmp_path / "t.dat"
    data.write_text("1,2\n")
    rows, bad = sqlldr("20260820", "u/p@db", str(data), baddir=str(tmp_path),
                       runner=_fake_runner("7 Rows successfully loaded", 0))
    assert (rows, bad) == (7, 0)
    assert not data.exists()
    assert not any(p.suffix == ".log" for p in tmp_path.iterdir())


def test_sqlldr_partial_keeps_log_removes_data(tmp_path):
    data = tmp_path / "t.dat"
    data.write_text("1,2\n")
    rows, bad = sqlldr(
        "20260820", "u/p@db", str(data), baddir=str(tmp_path),
        runner=_fake_runner(
            "5 Rows successfully loaded\n"
            "2 Rows not loaded due to data errors", 2))
    assert (rows, bad) == (5, 2)
    assert not data.exists()
    assert any(p.name.endswith(".log") for p in tmp_path.iterdir())


def test_sqlldr_failure_raises_with_output(tmp_path):
    data = tmp_path / "t.dat"
    data.write_text("1,2\n")
    with pytest.raises(RuntimeError):
        sqlldr("20260820", "u/p@db", str(data), baddir=str(tmp_path),
               runner=_fake_runner("0 Rows successfully loaded", 1))
    assert data.exists()  # failure keeps the data file


def test_sqlldr_log_parses_singular_row():
    import tempfile
    with tempfile.NamedTemporaryFile("w", suffix=".log", delete=False) as fh:
        fh.write("1 Row successfully loaded\n1 Row not loaded due to data errors")
    assert sqlldr_log(fh.name) == (1, 1)


# ----------------------------------------------------------- file utils


def test_file_copy_recursive_with_symlink_and_modes(tmp_path):
    src = tmp_path / "src"
    (src / "sub").mkdir(parents=True)
    (src / "a.txt").write_text("A")
    os.chmod(src / "a.txt", 0o640)
    (src / "sub" / "b.txt").write_text("B")
    os.symlink("a.txt", src / "lnk")
    dest = tmp_path / "dest"
    file_copy(str(src), str(dest))
    assert (dest / "a.txt").read_text() == "A"
    assert (dest / "sub" / "b.txt").read_text() == "B"
    assert os.readlink(dest / "lnk") == "a.txt"
    assert (os.stat(dest / "a.txt").st_mode & 0o777) == 0o640


def test_is_files_and_dirs_exist(tmp_path):
    f = tmp_path / "x.txt"
    f.write_text("x")
    is_files_exist([str(f)])
    with pytest.raises(FileNotFoundError, match="HasError"):
        is_files_exist([str(f), str(tmp_path / "missing")])
    is_dirs_exist([str(tmp_path)])
    with pytest.raises(FileNotFoundError):
        is_dirs_exist([str(tmp_path / "nodir")], create=False)
    is_dirs_exist([str(tmp_path / "made" / "deep")], create=True)
    assert (tmp_path / "made" / "deep").is_dir()


def test_ftp_file_list_remote_pipeline(spark):
    """Remote FtpFileList = connector info_list -> regex on the NAME
    field -> TimeParse -> full info string emitted (sftp.go:299-329)."""
    tree = {
        "LIST:/pm/k.csv": [
            "-rw-r--r--    1 u  g   10 Oct 09 17:23 K_20260820121314.csv"],
        "LIST:/pm/skip.txt": [
            "-rw-r--r--    1 u  g   10 Oct 09 17:23 nodate.txt"],
    }
    from xutil_spark.sources.remote import ftp_file_list

    conn = XFtp("h:21", "u", "p", transport=FakeTransport(tree), now=_NOW)
    out = ftp_file_list(
        spark, conn,
        [((["/pm/k.csv", "/pm/skip.txt"]),
          {"kpi": r"K_(\d{14})\.csv"})],
    ).toPandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert r["rule_id"] == "kpi"
    assert r["dtime"] == "2026-08-20 12:13:14"
    assert r["fname"].startswith("/pm/K_20260820121314.csv,file,10,")


def test_ftp_file_list_scopes_regexes_to_their_own_rule_set(spark):
    """Regression: rule sets were pooled — every set's regexes ran over
    every set's listings, emitting phantom rows whenever a regex
    matched the OTHER set's files.  The reference scopes each set's
    Info regexes to that set's own InfoList (sftp.go:307-316)."""
    tree = {
        "LIST:/a/K_1.csv": [
            "-rw-r--r--    1 u  g   10 Oct 09 17:23 K_20260101000000.csv"],
        "LIST:/b/K_2.csv": [
            "-rw-r--r--    1 u  g   10 Oct 09 17:23 K_20260202000000.csv"],
    }
    from xutil_spark.sources.remote import ftp_file_list

    conn = XFtp("h:21", "u", "p", transport=FakeTransport(tree), now=_NOW)
    # both rule sets' regexes match ANY K_<14 digits>.csv name — only
    # the set's own listing may produce rows
    out = ftp_file_list(
        spark, conn,
        [((["/a/K_1.csv"]), {"ra": r"K_(\d{14})\.csv"}),
         ((["/b/K_2.csv"]), {"rb": r"K_(\d{14})\.csv"})],
    ).toPandas().sort_values("rule_id").reset_index(drop=True)
    assert len(out) == 2
    assert list(out["rule_id"]) == ["ra", "rb"]
    assert out.loc[0, "fname"].startswith("/a/K_20260101000000.csv,")
    assert out.loc[1, "fname"].startswith("/b/K_20260202000000.csv,")
