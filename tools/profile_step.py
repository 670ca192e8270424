"""Profile a trainer step and print the top device ops by self-time.

Runs N iterations of a trainer family's jitted train step under
``jax.profiler.trace`` and parses the captured trace
(``plugins/profile/*/…trace.json.gz``, chrome-trace JSON) directly — no
TensorBoard needed. Device-lane events are grouped by op name and ranked
by total duration, giving the op-level answer to "where does the step
time go" (the MFU-vs-ceiling gap analysis in docs/DESIGN.md).

Run (TPU):  python tools/profile_step.py --trainer unsup --size 384 \
                --batch 8 --bf16 --iters 5
"""

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys
import tempfile

sys.path.insert(0, ".")


def load_trace_events(profile_dir):
    """All complete ('X') events from every trace.json.gz under the
    profile dir, with their process/thread names resolved."""
    paths = glob.glob(os.path.join(profile_dir, "plugins", "profile",
                                   "*", "*.trace.json.gz"))
    if not paths:
        raise FileNotFoundError(f"no trace.json.gz under {profile_dir}")
    events, names = [], {}
    for p in paths:
        with gzip.open(p, "rt") as f:
            trace = json.load(f)
        for ev in trace.get("traceEvents", []):
            ph = ev.get("ph")
            if ph == "M" and ev.get("name") in ("process_name",
                                                "thread_name"):
                key = (ev.get("pid"), ev.get("tid"),
                       ev["name"] == "process_name")
                names[key] = ev.get("args", {}).get("name", "")
            elif ph == "X":
                events.append(ev)
    return events, names


def device_lane(ev, names):
    """Name of the process/thread lane an event belongs to."""
    proc = names.get((ev.get("pid"), None, True),
                     names.get((ev.get("pid"), ev.get("tid"), True), ""))
    if not proc:  # some traces key process_name with tid=0
        proc = next((v for (pid, _, is_proc), v in names.items()
                     if is_proc and pid == ev.get("pid")), "")
    thread = names.get((ev.get("pid"), ev.get("tid"), False), "")
    return proc, thread


def parse_hlo_categories(hlo_text):
    """Map every instruction name in the optimized HLO module to a compute
    category, so trace op names (``fusion.265``) become attributable.

    Fusions are classified by the opcodes inside the fused computation they
    call (a fusion containing a convolution is MXU work no matter what
    elementwise ops ride along); everything else by its own opcode.
    Categories: conv (MXU), reduce (norm statistics / loss reductions),
    elementwise (VPU), convert/copy (layout + precision traffic), other.
    """
    import re

    # 1. opcodes inside each computation body. Header param shapes can
    # themselves contain parens (tiled layouts: bf16[...]{...T(8,128)(2,1)}),
    # so the param list is matched greedily up to the final ") -> ".
    comp_ops = {}
    current = None
    for line in hlo_text.splitlines():
        m = re.match(r"(?:ENTRY\s+)?%?([\w.\-]+)\s+\(.*\)\s*->\s*.*\{",
                     line.strip())
        if m:
            current = m.group(1)
            comp_ops[current] = set()
            continue
        if current is None:
            continue
        if line.strip() == "}":
            current = None
            continue
        # type is a plain shape (f32[8,384,384,72]{...}) or a tuple
        # "(f32[...], f32[...])"; both can embed parens in tiled layouts
        # (…:T(8,128)(2,1)), so skip the type non-greedily — the first
        # lowercase word followed by '(' after '= ' is the opcode
        m = re.search(r"=\s+.*?\b([a-z][\w\-]*)\(", line)
        if m:
            comp_ops[current].add(m.group(1))

    def ops_to_cat(ops):
        if "convolution" in ops:
            return "conv"
        if "dot" in ops:
            return "matmul"
        if ops & {"reduce", "reduce-window"}:
            return "reduce"
        if ops and ops <= {"convert", "copy", "bitcast", "transpose",
                           "reshape", "bitcast-convert"}:
            return "convert/copy"
        if ops:
            return "elementwise"
        return "other"

    # 2. fusion instructions -> category of their called computation; keyed
    # both by the exact instruction name and by the name with `.clone`
    # suffixes stripped (trace names and HLO names disagree on cloning).
    # Also keep each fusion's op_name metadata: the jaxpr source path
    # ("jit(train_step)/.../ConvBlock_3/conv/conv_general_dilated") that
    # attributes the op to model code.
    instr_cat, instr_src = {}, {}
    for m in re.finditer(
            r"%([\w.\-]+)\s+=\s+([^\n]*?)\bfusion\("
            r"[^\n]*?calls=%([\w.\-]+)([^\n]*)",
            hlo_text):
        cat = ops_to_cat(comp_ops.get(m.group(3), set()))
        src = re.search(r'op_name="([^"]+)"', m.group(4))
        instr_cat[m.group(1)] = cat
        if src:
            instr_src[m.group(1)] = src.group(1)
        base = re.sub(r"\.clone(\.\d+)*", "", m.group(1))
        instr_cat.setdefault(base, cat)
        if src:
            instr_src.setdefault(base, src.group(1))
    return instr_cat, instr_src


def categorize_trace_name(name, instr_cat):
    """Category for a trace event name (HLO instruction without '%')."""
    import re
    if name in instr_cat:
        return instr_cat[name]
    stripped = re.sub(r"\.clone(\.\d+)*", "", name)
    if stripped in instr_cat:
        return instr_cat[stripped]
    base = name.split("(")[0]  # jit_train_step(123...) -> jit_train_step
    if base.startswith("jit_") or base.startswith("pjit"):
        return None  # module-level span: would double-count its children
    root = base.split(".")[0]
    if root in ("convolution", "custom-call"):
        return "conv"
    if root == "dot":
        return "matmul"
    # named fusions carry their seed ops in the name (XLA naming pass):
    # loop_convolution_fusion / convert_reduce_fusion / input_reduce_fusion
    toks = set(root.split("_"))
    if "convolution" in toks:
        return "conv"
    if "dot" in toks:
        return "matmul"
    if toks & {"reduce", "scatter"}:
        return "reduce"
    if root.startswith("reduce"):
        return "reduce"
    if root in ("convert", "copy", "copy-start", "copy-done", "bitcast",
                "transpose", "reshape"):
        return "convert/copy"
    if root.endswith("fusion") or root == "fusion":
        return "elementwise" if toks & {"convert", "select", "add",
                                        "multiply", "loop"} else "other"
    return "elementwise" if root.isidentifier() else "other"


def module_of(src):
    """Collapse a jaxpr source path to (module, direction) — the unit of
    the attribution table. 'transpose(jvp(...))' spans are backward ops,
    plain 'jvp'/'jit' spans forward; the module is the first named Flax
    submodule on the path (ConvLSTM_0 / ConvBlock_3 / dec_fm / ...), or
    the leading primitive for physics/optimizer ops outside any module."""
    direction = "bwd" if "transpose(" in src else "fwd"
    parts = src.split("/")
    for i, p in enumerate(parts[1:], 1):
        if "(" in p:
            continue
        # a submodule name, not the primitive leaf itself
        if i < len(parts) - 1 or not p.islower():
            return p, direction
        break
    return "<top-level>", direction


def summarize(events, names, top=25, lane_filter=None):
    """Group device-side events by op name; return rows ranked by total
    duration. Host python/runtime lanes are skipped (they overlap device
    time and double-count)."""
    per_op = collections.defaultdict(lambda: [0.0, 0])
    lanes = collections.Counter()
    for ev in events:
        proc, thread = device_lane(ev, names)
        lane = f"{proc}/{thread}"
        lanes[lane] += 1
        hay = lane.lower()
        if lane_filter:
            if lane_filter.lower() not in hay:
                continue
        elif not any(k in hay for k in ("/device:", "tpu", "xla", "stream")):
            continue
        if "step" in thread.lower() and "xla" not in hay:
            continue
        dur = float(ev.get("dur", 0.0))  # microseconds
        per_op[ev.get("name", "?")][0] += dur
        per_op[ev.get("name", "?")][1] += 1
    rows = sorted(per_op.items(), key=lambda kv: -kv[1][0])
    return rows, lanes


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trainer", default="unsup",
                    choices=["sup", "unsup", "teaug", "mag", "single",
                             "gan"])
    ap.add_argument("--size", type=int, default=384)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--filters", type=int, default=0,
                    help="0 = the trainer's reference width")
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--dir", default="",
                    help="keep the profile here (default: tmp, parsed "
                         "then discarded)")
    ap.add_argument("--lane", default="",
                    help="only sum lanes containing this substring "
                         "(default: device/TPU/XLA lanes)")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from ideal_gan_tpu import physics as ph

    widths = {"sup": 72, "teaug": 72, "unsup": 32, "mag": 36, "single": 36,
              "gan": 36}
    width = args.filters or widths[args.trainer]
    nb, h = args.batch, args.size
    rng = np.random.default_rng(0)
    maps = (rng.normal(size=(nb, 3, h, h, 2)) * 0.3).astype(np.float32)
    te = np.asarray(ph.te_train(6, bs=nb))
    acqs = np.asarray(jax.jit(ph.synthesize)(jnp.asarray(maps),
                                             jnp.asarray(te)))
    key = jax.random.PRNGKey(0)

    if args.trainer == "sup":
        from ideal_gan_tpu.train import sup as tr
        cfg = dict(tr.DEFAULTS, n_G_filters=width, batch_size=nb, epochs=1,
                   out_vars="PM", bf16=args.bf16)
        model = tr.build_model(cfg)
        step, tx = tr.make_train_step(cfg, model)
        state = tr.init_state(cfg, model, tx, key, acqs[:1])
        batch = (jnp.asarray(acqs), jnp.asarray(maps), jnp.asarray(te))
    elif args.trainer == "teaug":
        from ideal_gan_tpu.train import teaug as tr
        cfg = dict(tr.DEFAULTS, n_G_filters=width, batch_size=nb, epochs=1,
                   bf16=args.bf16)
        model = tr.build_model(cfg)
        step, tx = tr.make_train_step(cfg, model)
        state = tr.init_state(cfg, model, tx, key, h=h, w=h)
        batch = (jnp.asarray(maps), jnp.asarray(te))
    elif args.trainer == "mag":
        from ideal_gan_tpu.train import mag as tr
        cfg = dict(tr.DEFAULTS, n_G_filters=width, batch_size=nb, epochs=1,
                   bf16=args.bf16)
        model = tr.build_model(cfg)
        step, tx = tr.make_train_step(cfg, model)
        state = tr.init_state(cfg, model, tx, key, h=h, w=h)
        batch = (jnp.asarray(maps), jnp.asarray(te))
    elif args.trainer == "single":
        from ideal_gan_tpu.train import single as tr
        cfg = dict(tr.DEFAULTS, n_G_filters=width, epochs=1,
                   bf16=args.bf16)
        g_mag, g_pha = tr.build_models(cfg)
        step, tx = tr.make_train_step(cfg, g_mag, g_pha)
        state = tr.init_state(cfg, g_mag, g_pha, tx, key, h=h, w=h)
        batch = (jnp.asarray(acqs[:1]), jnp.asarray(maps[:1]),
                 jnp.asarray(te[:1]))
    elif args.trainer == "gan":
        # PI-VAE adversarial g+d pair at the bench harness's batch-2
        # operating point (benchmarks/train_step_time.py gan section)
        from ideal_gan_tpu.train import gan as tr
        gb = min(nb, 2)
        ff = rng.uniform(0, 0.6, (nb, h, h)).astype(np.float32)
        pd = rng.uniform(0.3, 0.9, (nb, h, h)).astype(np.float32)
        zeros = np.zeros_like(ff)
        b_mag = np.stack([
            np.stack([ff, zeros], -1),
            np.stack([pd, rng.uniform(0, .4, (nb, h, h)).astype(np.float32)],
                     -1),
            np.stack([rng.uniform(-.2, .2, (nb, h, h)).astype(np.float32),
                      rng.uniform(-.2, .2, (nb, h, h)).astype(np.float32)],
                     -1)], 1).astype(np.float32)
        A_mag = np.asarray(jax.jit(ph.synthesize_mag)(jnp.asarray(b_mag),
                                                      jnp.asarray(te)))
        cfg = dict(tr.DEFAULTS, batch_size=gb, epochs=1, adv_train=True,
                   A_loss="pix-wise", bf16=args.bf16)
        models = tr.build_models(cfg)
        g_step, d_step, txs = tr.make_train_steps(cfg, models)
        state = tr.init_state(cfg, models, txs, key, A_mag[:1])
        gbatch = (jnp.asarray(A_mag[:gb]), jnp.asarray(b_mag[:gb]),
                  jnp.asarray(te[:gb]))
        instr_cat, instr_src = {}, {}
        try:
            hlo = g_step.lower(state, gbatch, key).compile().as_text()
            c1, s1 = parse_hlo_categories(hlo)
            state, gm, fake = g_step(state, gbatch, key)
            hlo = d_step.lower(state, gbatch[0], fake).compile().as_text()
            c2, s2 = parse_hlo_categories(hlo)
            instr_cat = {**c1, **c2}
            instr_src = {**s1, **s2}
        except Exception as e:
            print(f"(hlo categorization unavailable: "
                  f"{type(e).__name__}: {e})")
            state, gm, fake = g_step(state, gbatch, key)
        state, dm_ = d_step(state, gbatch[0], fake)
        jax.block_until_ready(dm_["D_loss"])
        prof_dir = args.dir or tempfile.mkdtemp(prefix="profstep_")
        with jax.profiler.trace(prof_dir):
            for _ in range(args.iters):
                state, gm, fake = g_step(state, gbatch, key)
                state, dm_ = d_step(state, gbatch[0], fake)
            jax.block_until_ready(dm_["D_loss"])
        report(args, prof_dir, instr_cat, instr_src)
        return
    else:
        from ideal_gan_tpu.train import unsup as tr
        cfg = dict(tr.DEFAULTS, n_G_filters=width, batch_size=nb, epochs=1,
                   bf16=args.bf16)
        g_fm, g_r2 = tr.build_models(cfg)
        step, tx = tr.make_train_step(cfg, g_fm, g_r2)
        state = tr.init_state(cfg, g_fm, g_r2, tx, key, acqs[:1])
        batch = (jnp.asarray(acqs), jnp.asarray(te))

    # lower + compile outside the trace; keep the optimized HLO so trace
    # fusion names can be attributed to compute categories (lower BEFORE
    # the warmup call — donation consumes `state`'s buffers)
    instr_cat, instr_src = {}, {}
    try:
        hlo_text = step.lower(state, batch, key).compile().as_text()
        instr_cat, instr_src = parse_hlo_categories(hlo_text)
    except Exception as e:
        print(f"(hlo categorization unavailable: {type(e).__name__}: {e})")
    state, m = step(state, batch, key)
    jax.block_until_ready(m["G_loss"])

    prof_dir = args.dir or tempfile.mkdtemp(prefix="profstep_")
    with jax.profiler.trace(prof_dir):
        for _ in range(args.iters):
            state, m = step(state, batch, key)
        jax.block_until_ready(m["G_loss"])

    report(args, prof_dir, instr_cat, instr_src)


def report(args, prof_dir, instr_cat, instr_src):
    events, names = load_trace_events(prof_dir)
    rows, lanes = summarize(events, names, top=args.top,
                            lane_filter=args.lane or None)
    print(f"{args.trainer} step @ {args.size}^2 b{args.batch} "
          f"{'bf16' if args.bf16 else 'f32'} x{args.iters} iters")
    if not rows:
        print("no device-lane events matched; lanes seen:")
        for lane, n in lanes.most_common(20):
            print(f"  {lane}: {n} events")
        return

    # split module-level spans (jit_train_step) from real ops: the span
    # covers its children, so it enters neither shares nor categories
    cat_of = {name: categorize_trace_name(name, instr_cat)
              for name, _ in rows}
    spans = [(n, dc) for n, dc in rows if cat_of[n] is None]
    ops = [(n, dc) for n, dc in rows if cat_of[n] is not None]
    total = sum(d for _, (d, _) in ops) or 1.0

    print(f"{'op':52s} {'cat':>12s} {'ms':>9s} {'calls':>6s} {'share':>7s}")
    for name, (dur, cnt) in ops[:args.top]:
        print(f"{name[:52]:52s} {cat_of[name]:>12s} {dur / 1e3:9.2f} "
              f"{cnt:6d} {100 * dur / total:6.1f}%")
        src = instr_src.get(name) or instr_src.get(
            re.sub(r"\.clone(\.\d+)*", "", name))
        if src:
            print(f"    ↳ {src[-100:]}")

    cats = collections.defaultdict(float)
    for name, (dur, _) in ops:
        cats[cat_of[name]] += dur
    print("\ncategory breakdown (all device ops):")
    for cat, dur in sorted(cats.items(), key=lambda kv: -kv[1]):
        print(f"  {cat:12s} {dur / 1e3:9.2f} ms  {100 * dur / total:5.1f}%")

    # per-module attribution: every op with op_name metadata rolls up to
    # its Flax submodule (fwd/bwd split); the rest is '(unattributed)' —
    # this is the table the MFU-vs-ceiling analysis in DESIGN.md wants
    mods = collections.defaultdict(float)
    for name, (dur, _) in ops:
        src = instr_src.get(name) or instr_src.get(
            re.sub(r"\.clone(\.\d+)*", "", name))
        if src:
            mod, direction = module_of(src)
            mods[f"{mod} {direction}"] += dur
        else:
            mods["(unattributed)"] += dur
    print(f"\nper-module attribution (ms per step, {args.iters} iters):")
    for mod, dur in sorted(mods.items(), key=lambda kv: -kv[1]):
        print(f"  {mod:32s} {dur / 1e3 / args.iters:8.2f} ms/step "
              f"{100 * dur / total:5.1f}%")
    for name, (dur, cnt) in spans:
        print(f"(module span {name[:48]}: {dur / 1e3:.1f} ms / {cnt} calls)")
    print(f"(op total: {total / 1e3:.1f} ms over {args.iters} iters; "
          f"hlo-mapped fusions: {len(instr_cat)}; profile dir: {prof_dir})")


if __name__ == "__main__":
    main()
