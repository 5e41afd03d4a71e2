#!/bin/bash
# Sequential TPU measurement sweep once the tunnel is back.
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
echo "=== probe ==="
timeout 90 python -c "
import jax, jax.numpy as jnp
print('alive', float(jnp.sum(jnp.ones((8,8)))))" 2>&1 | grep -v WARNING || exit 1

echo "=== flagship base-only fused_raymarch ==="
timeout 900 python - <<'EOF' 2>&1 | grep -v WARNING
import sys
sys.path.insert(0, "/root/repo")
import bench
from nerfstudio_thermal_tpu.configs import method_configs as mc
_orig = mc.get_method_config
def patched(name):
    cfg = _orig(name)
    if name == "thermal-nerfacto-tpu":
        cfg.model.fused_raymarch = True
        cfg.model.fused_raymarch_proposals = False
    return cfg
mc.get_method_config = patched
bench.build_setup.__globals__  # keep import
import importlib
# bench imports get_method_config inside build_setup via from-import; patch there
bench.run("thermal-nerfacto-tpu", "train_rays_per_sec", n_steps=30)
EOF

echo "=== flagship base+props fused (NIG off) ==="
timeout 900 python - <<'EOF' 2>&1 | grep -v WARNING
import sys
sys.path.insert(0, "/root/repo")
import bench
from nerfstudio_thermal_tpu.configs import method_configs as mc
_orig = mc.get_method_config
def patched(name):
    cfg = _orig(name)
    if name == "thermal-nerfacto-tpu":
        cfg.model.fused_raymarch = True
        cfg.model.fused_raymarch_proposals = True
    return cfg
mc.get_method_config = patched
bench.run("thermal-nerfacto-tpu", "train_rays_per_sec", n_steps=30)
EOF

echo "=== flagship fused_field (megakernel base) ==="
timeout 900 python - <<'PYEOF' 2>&1 | grep -v WARNING
import sys
sys.path.insert(0, "/root/repo")
import bench
from nerfstudio_thermal_tpu.configs import method_configs as mc
_orig = mc.get_method_config
def patched(name):
    cfg = _orig(name)
    if name == "thermal-nerfacto-tpu":
        cfg.model.fused_raymarch = True
        cfg.model.fused_field = True
        cfg.model.fused_raymarch_proposals = False
    return cfg
mc.get_method_config = patched
bench.run("thermal-nerfacto-tpu", "train_rays_per_sec", n_steps=30)
PYEOF

echo "=== prop microbench (NIG off) ==="
NS_RAY_NIG=0 timeout 900 python /root/repo/tools/bench_fused_raymarch.py prop1 2>&1 | grep -v WARNING
NS_RAY_NIG=0 timeout 900 python /root/repo/tools/bench_fused_raymarch.py prop2 2>&1 | grep -v WARNING

echo "=== base microbench ==="
timeout 1200 python /root/repo/tools/bench_fused_raymarch.py base 2>&1 | grep -v WARNING
echo "=== done ==="
