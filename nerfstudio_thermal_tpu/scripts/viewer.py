"""ns-viewer: run the web viewer on a trained checkpoint.

Behavioral spec: reference `nerfstudio/scripts/viewer/run_viewer.py`.
"""

import sys
from pathlib import Path


def main(argv=None) -> int:
    from nerfstudio_thermal_tpu.utils.precision import ensure_exact_f32_matmuls

    ensure_exact_f32_matmuls()  # also re-asserts $JAX_PLATFORMS (see util)
    argv = list(sys.argv[1:] if argv is None else argv)
    load_config = None
    port = 7007
    i = 0
    while i < len(argv):
        tok = argv[i]
        if tok in ("-h", "--help"):
            print("usage: ns-viewer --load-config CONFIG.yml [--port 7007]")
            return 0
        if tok.startswith("--load-config"):
            load_config = Path(tok.split("=", 1)[1] if "=" in tok else argv[i + 1])
            i += 1 if "=" in tok else 2
            continue
        if tok.startswith("--port"):
            port = int(tok.split("=", 1)[1] if "=" in tok else argv[i + 1])
            i += 1 if "=" in tok else 2
            continue
        i += 1
    if load_config is None:
        print("error: --load-config is required", file=sys.stderr)
        return 2

    from nerfstudio_thermal_tpu.utils.eval_utils import eval_setup
    from nerfstudio_thermal_tpu.viewer.server import (
        ViewerServer,
        make_model_export_fn,
        make_model_render_fn,
        probe_output_names,
    )

    config, trainer, params = eval_setup(load_config)
    model = trainer.pipeline.model
    cameras = trainer.datamanager.eval_cameras
    if int(cameras.camera_to_worlds.shape[0]) == 0:
        # datasets whose split leaves no eval images still need a camera
        # for output probing / export bounds
        cameras = trainer.datamanager.train_cameras

    server = ViewerServer(
        make_model_render_fn(model, lambda: params),
        output_names=probe_output_names(model, params, cameras),
        port=port,
        save_dir=load_config.parent,
        export_fn=make_model_export_fn(
            model, lambda: params, cameras, load_config.parent
        ),
    )
    server.start(block=True)
    return 0


def entrypoint():
    sys.exit(main())


if __name__ == "__main__":
    entrypoint()
