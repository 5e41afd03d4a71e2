"""ns-download-data: registry surface + download engine (offline).

Reference spec: nerfstudio/scripts/downloads/download_data.py — the same
dataset families and capture names must resolve; the network itself is
faked (zero-egress environment).
"""

import tarfile
import zipfile

import pytest

from nerfstudio_thermal_tpu.scripts import download_data as dd


def test_all_reference_families_registered():
    # reference subcommand set (download_data.py:540-556)
    for fam in [
        "blender", "sitcoms3d", "nerfstudio", "record3d", "dnerf",
        "phototourism", "sdfstudio", "nerfosr", "mill19", "eyefultower",
    ]:
        assert fam in dd.FAMILIES, fam


def test_capture_registries_match_reference_surface():
    assert set(dd.NERFSTUDIO_DATASET_SUBSET) <= set(dd.NERFSTUDIO_CAPTURES)
    assert "poster" in dd.NERFSTUDIO_CAPTURES
    assert len(dd.PHOTOTOURISM_CAPTURES) == 10
    assert len(dd.SDFSTUDIO_CAPTURES) == 8
    assert len(dd.NERFOSR_CAPTURES) == 9
    assert set(dd.MILL19_CAPTURES) == {"building", "rubble"}


def test_resolve_source_defaults_and_errors():
    kind, url, cap = dd.resolve_source("nerfstudio", None)
    assert (kind, cap) == ("gdrive", "bww_entrance")
    assert url.startswith("https://drive.google.com/uc?id=")

    kind, url, cap = dd.resolve_source("phototourism", "taj-mahal")
    assert kind == "https" and url.endswith("taj_mahal.tar.gz")

    kind, url, cap = dd.resolve_source("blender", None)
    assert cap == "blender" and kind == "gdrive"

    with pytest.raises(KeyError):
        dd.resolve_source("sdfstudio", "not-a-capture")


def test_download_capture_offline_fails_with_manual_instructions(tmp_path, capsys, monkeypatch):
    def boom(url, dest):
        raise OSError("no egress")

    monkeypatch.setattr(dd, "_download_url", boom)
    rc = dd.download_capture("nerfstudio", "poster", tmp_path)
    assert rc == 1
    err = capsys.readouterr().err
    assert "gdown" in err and "no network egress" in err
    # no leftover partial archives
    assert not list((tmp_path / "nerfstudio").glob("*")) or not any(
        p.suffix == ".zip" for p in (tmp_path / "nerfstudio").iterdir()
    )


def _fake_fetch_zip(payload_dir_name):
    """Returns a _download_url stand-in that writes a zip holding one
    top-level folder with one file."""

    def fetch(url, dest):
        dest.parent.mkdir(parents=True, exist_ok=True)
        with zipfile.ZipFile(dest, "w") as zf:
            zf.writestr(f"{payload_dir_name}/a.txt", "hello")

    return fetch


def test_download_capture_extracts_and_flattens(tmp_path, monkeypatch):
    monkeypatch.setattr(dd, "_download_url", _fake_fetch_zip("poster_src"))
    rc = dd.download_capture("nerfstudio", "poster", tmp_path)
    assert rc == 0
    assert (tmp_path / "nerfstudio" / "poster" / "a.txt").read_text() == "hello"
    assert not list((tmp_path / "nerfstudio").glob(".download_*"))
    assert not list((tmp_path / "nerfstudio").glob(".tmp_*"))


def test_download_family_extract_rename(tmp_path, monkeypatch):
    # blender: archive holds nerf_synthetic/, renamed to blender/
    monkeypatch.setattr(dd, "_download_url", _fake_fetch_zip("nerf_synthetic"))
    rc = dd.download_capture("blender", None, tmp_path)
    assert rc == 0
    assert (tmp_path / "blender" / "a.txt").exists()
    assert not (tmp_path / "nerf_synthetic").exists()


def test_download_tarball(tmp_path, monkeypatch):
    def fetch(url, dest):
        assert url.endswith(".tar.gz")
        dest.parent.mkdir(parents=True, exist_ok=True)
        src = tmp_path / "payload" / "inner"
        src.mkdir(parents=True)
        (src / "b.txt").write_text("tar")
        with tarfile.open(dest, "w:gz") as tf:
            tf.add(src, arcname="inner")

    monkeypatch.setattr(dd, "_download_url", fetch)
    rc = dd.download_capture("phototourism", "trevi-fountain", tmp_path)
    assert rc == 0
    assert (
        tmp_path / "phototourism" / "trevi-fountain" / "b.txt"
    ).read_text() == "tar"


def test_main_cli(tmp_path, monkeypatch, capsys):
    assert dd.main(["--help"]) == 0
    assert "phototourism" in capsys.readouterr().out
    assert dd.main(["no-such-dataset"]) == 2
    capsys.readouterr()

    calls = []
    monkeypatch.setattr(
        dd, "download_capture", lambda name, cap, sd: calls.append((name, cap)) or 0
    )
    assert dd.main(["nerfstudio", "--capture-name", "nerfstudio-dataset"]) == 0
    assert [c[1] for c in calls] == dd.NERFSTUDIO_DATASET_SUBSET

    calls.clear()
    assert dd.main(["mill19", "--capture-name=all", "--save-dir", str(tmp_path)]) == 0
    assert {c[1] for c in calls} == {"building", "rubble"}

    # single-archive family rejects --capture-name all
    assert dd.main(["dnerf", "--capture-name", "all"]) == 2
