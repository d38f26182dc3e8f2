"""Per-instruction roofline of the headline-bench hot step (VERDICT r3 #4).

Joins TWO artifacts for the EXACT bench.py workload (114M DDPM UNet,
batch 8, 256px, bf16 torso / fp32 GN, simplified DDNM+ host-loop step):

 1. the optimized HLO of the hot-step executable (jit .lower().compile()),
    parsed per instruction: which fusions contain convolutions (MXU work,
    FLOPs computed analytically from the conv shapes + window) and how many
    bytes each instruction's parameters + outputs touch in HBM;
 2. an xplane trace of the same executable (tools/experiments/
    headline_trace.py), parsed per instruction: measured serialized device
    time.

For every instruction on the serialized timeline this yields
  floor_i = max(flops_i / MXU_PEAK, bytes_i / HBM_BW)
and the whole-step headroom estimate
  1 - sum(floor_i) / sum(measured_i)
— i.e. how much faster the step could run if EVERY instruction hit its
compute or memory roofline, with the same fusion boundaries and numerics.
This is the "prove it immovable (or find the lever)" analysis: buckets
whose measured time is far above floor are the levers; if the total is
within ~10%, the step is at its structural ceiling.

Peaks are v5e: 197 bf16 TFLOP/s MXU, HBM ~819 GB/s spec / ~550 GB/s
sustained (the sustained figure is what elementwise fusions measure on
this chip — docs/PERFORMANCE.md); both reported.

Run (CPU is fine for the HLO if a trace dir is given; the trace itself
must come from the TPU):
  python tools/experiments/headline_trace.py --steps 12   # on TPU
  python tools/experiments/headline_roofline.py /tmp/headline_trace
      [--steps 12] [--hlo /tmp/headline_step.hlo.txt]
"""

from __future__ import annotations

import argparse
import re
import sys
from collections import defaultdict
from pathlib import Path

REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO))

MXU_PEAK = 197e12  # v5e bf16
HBM_BW_SPEC = 819e9
HBM_BW_SUST = 550e9

_SHAPE_RE = re.compile(r"(f32|bf16|f16|s32|u32|s8|u8|pred|f64|s64|u64)"
                       r"\[([\d,]*)\]")
_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "s8": 1,
          "u8": 1, "pred": 1, "f64": 8, "s64": 8, "u64": 8}


def _shape_bytes(m):
    dt, dims = m.group(1), m.group(2)
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * _BYTES[dt]


def _first_shapes_bytes(text, max_shapes=None):
    """Sum the byte sizes of all shapes appearing in an HLO snippet."""
    total = 0
    for i, m in enumerate(_SHAPE_RE.finditer(text)):
        if max_shapes is not None and i >= max_shapes:
            break
        total += _shape_bytes(m)
    return total


_CONV_RE = re.compile(
    r"convolution\(|%convolution", re.IGNORECASE)
_DOT_RE = re.compile(r"= \S+ dot\(| dot\(", re.IGNORECASE)


def _conv_flops(line):
    """FLOPs of one HLO convolution line: 2 * out_elems * Cin * kh * kw.

    HLO convs here are NHWC with kernel HWIO (dim_labels=b01f_01io->b01f):
    out shape [N,H,W,Cout], kernel [kh,kw,Cin,Cout]. Grouped convs divide
    Cin by feature_group_count."""
    shapes = _SHAPE_RE.findall(line)
    if len(shapes) < 3:
        return 0
    # line: %name = OUT convolution(IN, KERNEL), window=... -> shapes order:
    # OUT, IN, KERNEL (operand type annotations inside parens)
    def dims(s):
        return [int(d) for d in s[1].split(",") if d]

    out, _inp, ker = dims(shapes[0]), dims(shapes[1]), dims(shapes[2])
    if len(ker) != 4 or len(out) != 4:
        return 0
    # kernel HWIO: the I dim is already Cin/feature_group_count, so the
    # per-output-element contraction is kh*kw*ker_cin for grouped and
    # ungrouped convs alike
    kh, kw, ker_cin, _cout = ker
    out_elems = 1
    for d in out:
        out_elems *= d
    return 2 * out_elems * ker_cin * kh * kw


_INST_RE = re.compile(r"\s*(?:ROOT\s+)?%?([\w\.\-]+)\s*=\s*(.*)")
_HEADER_RE = re.compile(r"^(ENTRY\s+)?%?([\w\.\-]+)\s*\(.*\{\s*$")


def _split_computations(hlo_text):
    """{computation_name: [instruction lines]} (scheduled-HLO text layout:
    headers at column 0 ending in '{', bodies indented, '}' at column 0)."""
    comps = {}
    cur = None
    for line in hlo_text.splitlines():
        if cur is None:
            m = _HEADER_RE.match(line)
            if m and not line.startswith(" "):
                cur = m.group(2)
                comps[cur] = []
            continue
        if line.startswith("}"):
            cur = None
            continue
        comps[cur].append(line)
    return comps


_LAYOUT_RE = re.compile(r"\{[^{}]*\}")
_OPCODE_RE = re.compile(r"(?:^|[\s)])([a-z][\w\-]*)\(([^)]*)\)")


def _strip_layouts(rest):
    """Drop {layout} annotations (they contain T(8,128) parens that confuse
    opcode/operand parsing). Stops at metadata= — everything we need (output
    type(s), opcode, operands) precedes it."""
    cut = rest.find("metadata=")
    if cut > 0:
        rest = rest[:cut]
    return _LAYOUT_RE.sub("", rest)


def _parse_call(rest):
    """(opcode, [operand names], output_bytes, first_out_dims) of one
    scheduled-HLO instruction line's right-hand side."""
    clean = _strip_layouts(rest)
    m = _OPCODE_RE.search(clean)
    opcode, args = (m.group(1), m.group(2)) if m else ("", "")
    out_part = clean[: m.start()] if m else clean
    nbytes = 0
    dims = None
    for sm in _SHAPE_RE.finditer(out_part):
        nbytes += _shape_bytes(sm)
        if dims is None:
            dims = [int(d) for d in sm.group(2).split(",") if d]
    ops = re.findall(r"%([\w\.\-]+)", args)
    return opcode, ops, nbytes, dims


def _out_dims(rest):
    _, _, nbytes, dims = _parse_call(rest)
    return dims, nbytes


def _operand_names(rest):
    return _parse_call(rest)[1]


def _dot_flops(out_dims, rhs_dims):
    if not out_dims or not rhs_dims:
        return 0
    n = 1
    for d in out_dims:
        n *= d
    r = 1
    for d in rhs_dims:
        r *= d
    k = max(r // max(out_dims[-1], 1), 1)
    return 2 * n * k


def _comp_mxu_flops(body):
    """Conv/dot FLOPs inside one fused computation: output shapes are inline;
    kernel shapes come from the computation's own parameter/instruction
    defs (parameters inside fusions carry full types)."""
    local = {}
    for line in body:
        lm = _INST_RE.match(line)
        if not lm:
            continue
        dims, nbytes = _out_dims(lm.group(2))
        local[lm.group(1)] = dims
    flops = 0
    for line in body:
        lm = _INST_RE.match(line)
        if not lm:
            continue
        rest = lm.group(2)
        if " convolution(" in rest or rest.startswith("convolution("):
            out, _ = _out_dims(rest)
            ops = _operand_names(rest)
            ker = local.get(ops[1]) if len(ops) > 1 else None
            if out and ker and len(ker) == 4 and len(out) == 4:
                kh, kw, ker_cin, _ = ker
                n = 1
                for d in out:
                    n *= d
                flops += 2 * n * ker_cin * kh * kw
        elif re.search(r"\bdot\(", rest):
            out, _ = _out_dims(rest)
            ops = _operand_names(rest)
            rhs = local.get(ops[1]) if len(ops) > 1 else None
            flops += _dot_flops(out, rhs)
    return flops


def parse_hlo(hlo_text):
    """Per-instruction {name: (flops, bytes)} for the ENTRY computation.

    bytes = output + operand sizes looked up from each operand's defining
    instruction (what crosses HBM at the fusion boundary; internal fusion
    temporaries live in VMEM). flops = conv/dot work inside the called
    computation (fusions) or on the line itself."""
    comps = _split_computations(hlo_text)
    entry_name = None
    for line in hlo_text.splitlines():
        if line.startswith("ENTRY"):
            m = _HEADER_RE.match(line)
            if m:
                entry_name = m.group(2)
            break
    body = comps.get(entry_name, [])

    out_bytes, out_dims = {}, {}
    for line in body:
        lm = _INST_RE.match(line)
        if not lm:
            continue
        dims, nbytes = _out_dims(lm.group(2))
        out_bytes[lm.group(1)] = nbytes
        out_dims[lm.group(1)] = dims

    insts = {}
    for line in body:
        lm = _INST_RE.match(line)
        if not lm:
            continue
        name, rest = lm.group(1), lm.group(2)
        head = rest.split("(")[0].split() if "(" in rest else []
        opcode = head[-1] if head else ""
        nbytes = out_bytes.get(name, 0)
        for op in _operand_names(rest):
            nbytes += out_bytes.get(op, 0)
        flops = 0
        if "fusion(" in rest:
            cm = re.search(r"calls=%?([\w\.\-]+)", rest)
            if cm:
                flops = _comp_mxu_flops(comps.get(cm.group(1), []))
        elif opcode == "convolution":
            out = out_dims.get(name)
            ops = _operand_names(rest)
            ker = out_dims.get(ops[1]) if len(ops) > 1 else None
            if out and ker and len(ker) == 4 and len(out) == 4:
                kh, kw, ker_cin, _ = ker
                n = 1
                for d in out:
                    n *= d
                flops = 2 * n * ker_cin * kh * kw
        elif opcode == "dot":
            ops = _operand_names(rest)
            flops = _dot_flops(out_dims.get(name),
                               out_dims.get(ops[1]) if len(ops) > 1 else None)
        insts[name] = (flops, nbytes)
    return insts


def parse_trace(trace_dir):
    """{instruction_name: total_ms} from the serialized 'XLA Ops' line."""
    try:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2
    except ImportError:
        from tensorflow.core.profiler.protobuf import xplane_pb2

    paths = sorted(Path(trace_dir).rglob("*.xplane.pb"))
    if not paths:
        raise SystemExit(f"no xplane.pb under {trace_dir}")
    space = xplane_pb2.XSpace()
    space.ParseFromString(paths[-1].read_bytes())
    times = defaultdict(float)
    for plane in space.planes:
        if "TPU" not in plane.name and "/device" not in plane.name.lower():
            continue
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        for line in plane.lines:
            if line.name.lower() != "xla ops":
                continue
            for ev in line.events:
                name = ev_meta.get(ev.metadata_id, "?")
                nm = re.match(r"%?([\w\.\-]+)", name)
                times[nm.group(1) if nm else name] += ev.duration_ps / 1e9
    return dict(times)


def build_step_hlo(out_path):
    """Compile the bench hot step and dump its optimized HLO."""
    import jax
    import jax.numpy as jnp

    from ddnm_tpu import schedules
    from ddnm_tpu.models.unet_ddpm import DDPMUNet
    from ddnm_tpu.operators import build_functional_operator
    from ddnm_tpu.sampling import build_schedule
    from ddnm_tpu.sampling import ddnm as ddnm_mod
    from ddnm_tpu.utils import enable_compilation_cache, jit_init

    enable_compilation_cache()
    BATCH, RES = 8, 256
    model = DDPMUNet(dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (BATCH, RES, RES, 3), dtype=jnp.float32)
    params = jit_init(model, rng, x[:1], jnp.zeros((1,)))

    def model_fn(p, xx, tt):
        return model.apply(p, xx, tt)

    betas = schedules.get_beta_schedule(
        "linear", beta_start=1e-4, beta_end=0.02,
        num_diffusion_timesteps=1000)
    sched = build_schedule(betas=betas, t_sampling=100)
    op = build_functional_operator(
        "sr_averagepooling", image_size=RES, deg_scale=4)
    y = op.A(x)
    body = ddnm_mod._Body(ddnm_mod._simplified_body,
                          (model_fn, op, 0.85, 0.0))
    lowered = ddnm_mod._host_step.lower(
        body, ddnm_mod._default_noise, params, x, y, jax.random.PRNGKey(1),
        500.0, 0.5, 0.49, None)
    compiled = lowered.compile()
    Path(out_path).write_text(compiled.as_text())
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    print(f"# aggregate cost analysis: {ca.get('flops', 0) / 1e12:.2f} "
          f"TFLOP, {ca.get('bytes accessed', 0) / 1e9:.2f} GB accessed")
    return out_path


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--steps", type=int, default=12,
                    help="hot steps in the trace (headline_trace --steps)")
    ap.add_argument("--hlo", type=str, default="/tmp/headline_step.hlo.txt")
    ap.add_argument("--top", type=int, default=15)
    ns = ap.parse_args(argv)

    hlo_path = Path(ns.hlo)
    if not hlo_path.exists():
        print("# compiling hot step for HLO dump ...", flush=True)
        build_step_hlo(hlo_path)
    insts = parse_hlo(hlo_path.read_text())
    times = parse_trace(ns.trace_dir)

    rows = []
    unmatched_ms = 0.0
    for name, ms in times.items():
        if name not in insts:
            unmatched_ms += ms
            continue
        flops, nbytes = insts[name]
        per_exec_ms = ms / ns.steps
        floor_c = flops / MXU_PEAK * 1e3
        floor_m = nbytes / HBM_BW_SUST * 1e3
        rows.append((name, per_exec_ms, flops, nbytes,
                     max(floor_c, floor_m), floor_c, floor_m))

    rows.sort(key=lambda r: -r[1])
    tot_ms = sum(r[1] for r in rows)
    tot_floor = sum(r[4] for r in rows)
    tot_floor_spec = sum(
        max(r[5], r[3] / HBM_BW_SPEC * 1e3) for r in rows)
    conv_ms = sum(r[1] for r in rows if r[2] > 0)
    conv_floor = sum(r[5] for r in rows if r[2] > 0)
    conv_flops = sum(r[2] for r in rows)

    print(f"\n# per-step serialized device time: {tot_ms:.2f} ms "
          f"({len(rows)} matched instructions; "
          f"{unmatched_ms / ns.steps:.2f} ms unmatched)")
    print(f"# total conv/dot FLOPs: {conv_flops / 1e12:.2f} TFLOP/step -> "
          f"MXU floor {conv_flops / MXU_PEAK * 1e3:.2f} ms")
    print(f"# MXU-instruction time {conv_ms:.2f} ms vs their compute floor "
          f"{conv_floor:.2f} ms ({100 * conv_floor / max(conv_ms, 1e-9):.0f}"
          f"% MXU efficiency)")
    print(f"# sum of per-instruction floors: {tot_floor:.2f} ms "
          f"(sustained {HBM_BW_SUST / 1e9:.0f} GB/s) / "
          f"{tot_floor_spec:.2f} ms (spec {HBM_BW_SPEC / 1e9:.0f} GB/s)")
    print(f"# headroom at fixed fusion boundaries: "
          f"{100 * (1 - tot_floor / max(tot_ms, 1e-9)):.0f}% (sustained BW)")

    print(f"\n| instruction | ms/step | TFLOP | GB | floor ms | measured/floor |")
    print("|---|---|---|---|---|---|")
    for name, ms, flops, nbytes, floor, fc, fm in rows[: ns.top]:
        tag = "MXU" if flops > 0 else "mem"
        print(f"| {name[:42]} ({tag}) | {ms:.3f} | {flops / 1e12:.3f} | "
              f"{nbytes / 1e9:.3f} | {floor:.3f} | "
              f"{ms / max(floor, 1e-9):.1f}x |")


if __name__ == "__main__":
    main()
