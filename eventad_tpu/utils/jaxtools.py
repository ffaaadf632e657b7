"""JAX runtime helpers shared by the entry points."""
from __future__ import annotations

import os


def setup_compilation_cache(path: str = "/root/.cache/jax_cc"):
    """Persistent compiled-program cache — first compiles of the big fused
    pipeline go over the device tunnel and are expensive; every later process
    reuses them.

    Also honours ``EVENTAD_PLATFORM`` (e.g. ``cpu``): the axon TPU plugin
    ignores ``JAX_PLATFORMS``, so this is the only way to force the entry
    points onto another backend without editing code."""
    import jax
    plat = os.environ.get("EVENTAD_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def wait_for_tpu(max_wait_s: float = 1500.0, probe_timeout_s: float = 240.0,
                 period_s: float = 60.0) -> bool:
    """Block until the axon TPU tunnel answers a trivial compile+fetch.

    The tunnel drops out for stretches; a process that initialises JAX while
    it is down hangs indefinitely with no error.  Probing in a SUBPROCESS
    (with a hard timeout) keeps this process's JAX uninitialised until the
    device is actually reachable, so benchmarks fail fast / wait bounded
    instead of hanging.  Returns True when the tunnel answered, False when
    ``max_wait_s`` elapsed (callers may still proceed — the outer harness's
    timeout then owns the failure).  No-op (True) when a CPU platform is
    forced via ``EVENTAD_PLATFORM``.
    """
    import subprocess
    import sys
    import time

    if os.environ.get("EVENTAD_PLATFORM", "").startswith("cpu"):
        return True
    probe_src = ("import jax, numpy as np, jax.numpy as jnp\n"
                 "x = jnp.ones((8, 128))\n"
                 "v = float(np.asarray((x @ x.T).sum()))\n"
                 "assert v == 8 * 128 * 8, v\n")
    deadline = time.monotonic() + max_wait_s
    first = True
    while True:
        try:
            r = subprocess.run([sys.executable, "-c", probe_src],
                               timeout=probe_timeout_s,
                               capture_output=True)
            if r.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
        if time.monotonic() >= deadline:
            print("wait_for_tpu: tunnel still unreachable after "
                  f"{max_wait_s:.0f}s, proceeding anyway", file=sys.stderr)
            return False
        if first:
            print("wait_for_tpu: TPU tunnel not answering, retrying "
                  f"(up to {max_wait_s:.0f}s)...", file=sys.stderr)
            first = False
        time.sleep(period_s)


def dynamic_zero_perturb(tree, c):
    """Perturb every array in ``tree`` by the dynamically-zero scalar ``c``
    (float add-0 / int add-0 / bool xor-false), so a ``lax.scan`` body that
    consumes the result treats the whole tree as loop-VARYING: XLA cannot
    hoist any stage that reads it, because it cannot prove ``c == 0``.

    Benchmarking helper: scan-amortised timings must not let the compiler
    hoist input-dependent stages (graph build, CNN branch) out of the loop,
    which would overstate throughput. Values are bit-identical when
    ``c == 0.0`` (add-0 flips -0.0 to +0.0, which no input here carries).
    """
    import jax
    import jax.numpy as jnp
    ci = c.astype(jnp.int32)
    cb = c != 0.0

    def p(x):
        if jnp.issubdtype(x.dtype, jnp.floating):
            return x + c.astype(x.dtype)
        if jnp.issubdtype(x.dtype, jnp.integer):
            return x + ci.astype(x.dtype)
        return jnp.logical_xor(x, cb)
    return jax.tree.map(p, tree)


def setup_debug_nans(enable: bool):
    """TPU analog of the reference's always-on torch detect_anomaly
    (utils/train.py:118) — opt-in here because it inhibits fusion."""
    import jax
    jax.config.update("jax_debug_nans", bool(enable))


def trace_device_ms(fn, iters: int = 10,
                    trace_dir: str = "/tmp/ev_trace_devms"):
    """True per-call DEVICE time of ``fn`` via the profiler: runs ``fn()``
    ``iters`` times under ``jax.profiler.trace`` and sums per-op device
    time from the xplane (hlo_stats), excluding control-flow ops whose
    inclusive time would double-count their bodies.

    This is the only per-dispatch latency number the axon tunnel cannot
    distort: pipelined wall timing is floored by the tunnel's ~1.3-1.7 ms
    host enqueue per dispatch (tools/probe_dispatch.py decomposition).
    Returns milliseconds per call, or None when xprof is unavailable.
    """
    import glob
    import json
    import shutil

    import jax

    shutil.rmtree(trace_dir, ignore_errors=True)
    with jax.profiler.trace(trace_dir):
        for _ in range(iters):
            fn()
    try:
        from xprof.convert import raw_to_tool_data as rtd
    except Exception:
        return None
    paths = sorted(glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True))
    if not paths:
        return None
    data, _ = rtd.xspace_to_tool_data([paths[-1]], "hlo_stats", {})
    if isinstance(data, bytes):
        data = data.decode()
    tbl = json.loads(data)
    cols = [c["id"] for c in tbl["cols"]]
    it, ic = cols.index("total_time"), cols.index("category")
    total_us = sum(r["c"][it]["v"] for r in tbl["rows"]
                   if r["c"][ic]["v"] not in ("while", "conditional"))
    return total_us / iters / 1e3



def packed_random_like(fn, seed: int = 0):
    """Benchmark-only fast init: shapes/dtypes via ``jax.eval_shape(fn)``
    (pure host-side tracing, zero device dispatches), values from seeded
    numpy, shipped to the default device as ONE packed transfer per dtype
    plus one jitted unpack dispatch.

    Why: on the axon tunnel, running an init function on-device is
    hundreds of tiny RNG dispatches (~70 ms round-trip each — the full
    model init measured 106 s), and per-leaf device_put of host arrays
    pays the same round-trip per leaf.  Packed, the same bytes move in
    ~6 s.  (An in-process CPU-backend init was tried first and HANGS
    under the axon plugin — this path never touches a second backend.)

    The values differ from the real ``init_*`` PRNG draws — fine for
    throughput benchmarks (weights are random either way) but NOT for
    numerical comparisons.  Fills are name-aware so eval-mode batch norm
    stays well-scaled (var=1, mean=0, scale=1, offsets/biases=0,
    everything else ~N(0, 0.05)): garbage-but-finite activations, no
    inf/NaN blowups through 50 BN layers.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    shapes = jax.eval_shape(fn)
    leaves_kp, treedef = jax.tree_util.tree_flatten_with_path(shapes)
    rng = np.random.RandomState(seed)

    def fill(path, sds):
        name = ""
        for k in reversed(path):
            name = str(getattr(k, "key", getattr(k, "name", getattr(
                k, "idx", ""))))
            if name:
                break
        dt = np.dtype(sds.dtype)
        if not np.issubdtype(dt, np.floating):
            return np.zeros(sds.shape, dt)
        if name in ("var", "scale"):
            return np.ones(sds.shape, dt)
        if name in ("mean", "offset") or name.endswith("bias") \
                or name == "b":
            return np.zeros(sds.shape, dt)
        return (rng.randn(*sds.shape) * 0.05).astype(dt)

    arrs = [fill(p, s) for p, s in leaves_kp]
    groups = {}
    for i, a in enumerate(arrs):
        groups.setdefault(a.dtype.str, []).append(i)
    dev_bufs = {k: jax.device_put(jnp.asarray(
        np.concatenate([arrs[i].ravel() for i in idxs])))
        for k, idxs in groups.items()}

    def unpack(bufs):
        outs = [None] * len(arrs)
        for k, idxs in groups.items():
            off = 0
            for i in idxs:
                n = int(np.prod(arrs[i].shape, dtype=np.int64))
                outs[i] = jax.lax.dynamic_slice(
                    bufs[k], (off,), (n,)).reshape(arrs[i].shape)
                off += n
        return outs

    out_leaves = jax.jit(unpack)(dev_bufs)
    return jax.tree_util.tree_unflatten(treedef, out_leaves)
