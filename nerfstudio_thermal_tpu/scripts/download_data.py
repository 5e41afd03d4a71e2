"""ns-download-data: dataset download helper.

Behavioral spec: reference `nerfstudio/scripts/downloads/download_data.py`
(blender/nerfstudio/... dataset downloads). Network egress may be
unavailable; failures explain how to place data manually.
"""

import sys
from pathlib import Path

DATASETS = {
    "blender": "https://drive.google.com/uc?id=18JxhpWD-4ZmuFKLzKlAw-w5PpzZxXOcG",
    "nerfstudio": "https://storage.googleapis.com/nerfstudio-data/{capture}.zip",
    "eyefultower": "s3://fb-baas-f32eacb9-8abb-11eb-b2b8-4857dd089e15/EyefulTower/{capture}/",
}


def _eyefultower(save_dir: Path, capture: str, resolution: str) -> int:
    """EyefulTower: AWS download (reference scripts/downloads/eyeful_tower.py)
    + cameras.json/splits.json -> transforms.json conversion. The conversion
    runs offline whenever the capture metadata is already on disk."""
    from nerfstudio_thermal_tpu.process_data.eyeful_utils import (
        process_eyeful_capture,
    )

    capture_dir = save_dir / "eyefultower" / capture
    if not (capture_dir / "cameras.json").exists():
        print(
            f"EyefulTower capture metadata not found at {capture_dir}.\n"
            f"Download with: aws s3 sync --no-sign-request "
            f"{DATASETS['eyefultower'].format(capture=capture)} {capture_dir}\n"
            f"then re-run this command to generate transforms.json.",
            file=sys.stderr,
        )
        return 1
    dest = process_eyeful_capture(capture_dir, resolution=resolution)
    print(f"wrote {dest}")
    return 0


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("-h", "--help"):
        print("usage: ns-download-data {blender|nerfstudio} [--save-dir DIR] [--capture-name NAME]")
        print("datasets:", ", ".join(DATASETS))
        return 0
    name = argv[0]
    save_dir = Path("data")
    capture = "poster"
    resolution = "jpeg_2k"
    i = 1
    while i < len(argv):
        if argv[i].startswith("--save-dir"):
            save_dir = Path(argv[i].split("=", 1)[1] if "=" in argv[i] else argv[i + 1])
            i += 1 if "=" in argv[i] else 2
        elif argv[i].startswith("--capture-name"):
            capture = argv[i].split("=", 1)[1] if "=" in argv[i] else argv[i + 1]
            i += 1 if "=" in argv[i] else 2
        elif argv[i].startswith("--resolution-name"):
            resolution = argv[i].split("=", 1)[1] if "=" in argv[i] else argv[i + 1]
            i += 1 if "=" in argv[i] else 2
        else:
            i += 1
    if name not in DATASETS:
        print(f"error: unknown dataset '{name}'", file=sys.stderr)
        return 2
    if name == "eyefultower":
        return _eyefultower(save_dir, capture, resolution)
    url = DATASETS[name].format(capture=capture)
    try:
        import urllib.request

        save_dir.mkdir(parents=True, exist_ok=True)
        dest = save_dir / f"{name}_{capture}.zip"
        print(f"downloading {url} -> {dest}")
        urllib.request.urlretrieve(url, dest)
        print("done; unzip to use")
        return 0
    except Exception as e:
        print(
            f"download failed ({e}). If this environment has no network "
            f"egress, download {url} elsewhere and place the extracted data "
            f"under {save_dir}.",
            file=sys.stderr,
        )
        return 1


def entrypoint():
    sys.exit(main())


if __name__ == "__main__":
    entrypoint()
