"""Trace-based variant timing: device busy ms per loop iteration.

See docs/PERFORMANCE.md 'Fused GN+SiLU+conv Pallas kernel: tried, measured,
XLA wins again' for the conclusions; this is an archived reproducible
experiment, not a production path.
"""
import sys, shutil, subprocess
sys.path.insert(0, str(__import__('pathlib').Path(__file__).parent))
sys.path.insert(0, str(__import__('pathlib').Path(__file__).resolve().parents[2]))
from ddnm_tpu.utils import enable_compilation_cache
enable_compilation_cache()
import fused_gn_conv as E
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from fused_gn_conv_ablations import _call, _kernel_noact, _kernel_nodot, _stats_only, _prologue

B, H, W, C, N = E.B, E.H, E.W, E.C, 50
x, w, gamma, beta = E.x, E.w, E.gamma, E.beta

VARIANTS = {
    "xla_chain": lambda z, w, g, b: E._chain_raw(z, w, g, b),
    "xla_conv": lambda z, w, g, b: jax.lax.conv_general_dilated(
        z, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.bfloat16),
    "stats_only": lambda z, w, g, b: _stats_only(z, g, b),
    "stats_pad": lambda z, w, g, b: _prologue(z, g, b),
    "pallas_full": lambda z, w, g, b: _call(E._kernel, z, w, g, b),
    "pallas_noact": lambda z, w, g, b: _call(_kernel_noact, z, w, g, b),
    "pallas_nodot": lambda z, w, g, b: _call(_kernel_nodot, z, w, g, b),
}

def loop(fn):
    @jax.jit
    def f(x, w, gamma, beta):
        return jax.lax.fori_loop(0, N, lambda i, z: fn(z, w, gamma, beta), x)
    return f

which = sys.argv[1]
fn = loop(VARIANTS[which])
jax.device_get(fn(x, w, gamma, beta))  # compile+warm outside the trace
d = f"/tmp/ddnm_exp_trace_{which}"
shutil.rmtree(d, ignore_errors=True)
with jax.profiler.trace(d):
    jax.device_get(fn(x, w, gamma, beta))
print(f"== {which}: busy per iter over {N} iters ==")
r = subprocess.run([sys.executable, str(Path(__file__).resolve().parents[2] / "tools" / "trace_report.py"), d, "--top", "4"],
                   capture_output=True, text=True)
print(r.stdout[-1400:])
