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
}


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("-h", "--help"):
        print("usage: ns-download-data {blender|nerfstudio} [--save-dir DIR] [--capture-name NAME]")
        print("datasets:", ", ".join(DATASETS))
        return 0
    name = argv[0]
    save_dir = Path("data")
    capture = "poster"
    i = 1
    while i < len(argv):
        if argv[i].startswith("--save-dir"):
            save_dir = Path(argv[i].split("=", 1)[1] if "=" in argv[i] else argv[i + 1])
            i += 1 if "=" in argv[i] else 2
        elif argv[i].startswith("--capture-name"):
            capture = argv[i].split("=", 1)[1] if "=" in argv[i] else argv[i + 1]
            i += 1 if "=" in argv[i] else 2
        else:
            i += 1
    if name not in DATASETS:
        print(f"error: unknown dataset '{name}'", file=sys.stderr)
        return 2
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
