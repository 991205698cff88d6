"""End-to-end throughput benchmark: 1024x2048 frames -> road-width scalars.

Prints JSON lines of the form
  {"metric": "...", "value": N, "unit": "fps", "vs_baseline": N, ...}
TWICE: a complete HEADLINE record as soon as the headline trials finish
(so a driver that kills the process mid-run still captures the result —
VERDICT r3 #1a), then a FINAL record enriched with the upload-inclusive
trial, the conv-roofline receipts and the full-res legs. Parsers that read
the LAST JSON line of stdout always get the most complete record available.

Baseline: the reference pipeline's 0.6375 s/frame (~1.57 fps) end-to-end on
its single GPU (thesis Tables 19/21; BASELINE.md). vs_baseline = fps / 1.57.

Budget: the whole run is bounded by BENCH_BUDGET_S (default 1200 s).
Weight TRAINING on a cold cache is the one unbounded cost — it is gated by
the same deadline (tools/train_bench_weights.py refuses to start a set that
cannot finish in the remaining budget and hard-stops at the deadline), with
a labeled random-weight fallback; the full-res legs and the probe suite are
skipped (with a log line) when the remaining budget is too small. Warm the
cache offline with ``python tools/train_bench_weights.py --full_res
--native`` (or tools/native_mae_curve.py for the deep native set).

Methodology
-----------
Full-size FCN-8s + monodepth (bf16 MXU compute, f32 geometry), streamed in
batches of 8 through the fused ``process_batch`` program (the sequence entry
point's batch path); all per-frame scalar results are stacked on device and
fetched in one transfer per batch.

* Frames are 3D-CONSISTENT synthetic road scenes (``utils.bench_scenes``):
  a true ground-plane corridor + fence planes rendered through the
  pipeline's own pinhole model, so every scene has an ANALYTIC road width.
  A pool of distinct scenes is uploaded once and cycled; frames stay
  device-resident because this dev environment reaches the chip through a
  ~30 MB/s relay (a fresh 48 MB uint8 batch upload costs ~1.6 s here vs
  ~4 ms on a production host's PCIe), so resident buffers measure the
  pipeline rather than the relay. The FINAL record also carries
  ``fps_with_upload`` — the same loop with each uint8 batch device_put
  inside the timing — plus the measured ``upload_mbps``, so the resident
  -pool caveat is a recorded delta, not a footnote (VERDICT r3 #5).
* The networks run REAL weights trained on such scenes
  (tools/train_bench_weights.py; cached in .bench_weights/), so the bench
  also reports CORRECTNESS: ``finite_frac`` (fraction of frames with a
  finite road width) and ``rw_mae_m`` (MAE vs the analytic width — the
  reference's own accuracy protocol is a hand-measured MAE sweep,
  semantic_depth.py:903-937). If no cache and no budget, the bench falls
  back to random weights and reports ``weights: "random"`` (timings remain
  valid: the masked fixed-capacity geometry makes cost
  occupancy-independent).
* >=104 frames per trial, 3 trials. The JSON carries mean/best/std across
  trials; the headline ``value`` is the best trial (the shared dev chip's
  throughput varies several-fold with external tenancy; best-of-N is the
  least-contended sample).
* ``mfu``: model FLOPs utilization — XLA's own cost analysis of the compiled
  batch executable (flops per batch x batches/s) against the chip's peak
  bf16 FLOP/s (per-generation table below). ``measured_peak_matmul_tflops``
  is a CHAINED big-matmul probe (data-dependent fori_loop, overheads
  amortized) — the sustained ceiling this chip+stack actually reaches.
* Conv-roofline receipts (VERDICT r3 #4): the batch program's jaxpr is
  walked for every convolution; the dominant (cin,cout,k) shape classes are
  re-timed as chained standalone probes at their true spatial shapes, and
  ``conv_weighted_ceiling_tflops`` = FLOP-weighted harmonic mean of those
  per-shape ceilings. ``frac_of_weighted_ceiling`` = the program's sustained
  TF/s over that ceiling — the "~85% of weighted conv roofline" argument of
  DESIGN.md 4d as recorded numbers (conservative: the sustained figure's
  denominator includes the non-conv 17% of the program). A value > 1.0 is
  possible and means the FUSED program outruns the sum of its isolated
  per-shape probes: each probe pays its own dispatch/layout cost and cannot
  overlap with neighboring ops, and on the shared dev chip the probes and
  the headline trials can land under different external tenancy. Read the
  probe-derived ceiling as a LOWER BOUND on what the convs can sustain,
  and frac >= ~0.85 (including > 1) as "the conv pipeline is at or past
  its isolated-op roofline" — i.e. XLA's fusion is recovering more than
  the probes' overheads.
* ``full_res_fps``: the native 1024x2048 path — every pixel enters the
  networks (input_s2d packed trunks, DESIGN.md 4c; no downsample round
  trip — the reference cannot do this at all), measured over the same
  scene pool with its own accuracy fields (``full_res_rw_mae_m``,
  ``full_res_f2f_mae_m``). ``full_res_dense_fps`` is the unmodified
  reference architecture evaluated densely at 1024x2048, for transparency.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REFERENCE_FPS = 1.0 / 0.6375  # thesis Table 19
BATCH = 8
POOL_BATCHES = 4  # distinct device-resident scene batches, cycled
FRAMES_PER_TRIAL = 104
TRIALS = 3
# Dense-architecture full-res batch (batch 2 -> 10.8 fps, batch 4 -> 14.6
# on a quiet chip; 4 fits since the s2d encoder stopped materializing plain
# full-res conv maps). The NATIVE leg tries 2x this first — its packed
# trunks use ~4x less activation memory — and falls back on OOM.
FULL_RES_BATCH = 4
BENCH_WEIGHTS_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_weights")
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "1200"))

# Bump when the probe/floor METHODOLOGY changes so stale sidecar receipts
# (below) are recomputed rather than replayed into the record.
_RECEIPT_VERSION = 2


def _receipt_load(name, key):
    """Weight-independent measurements (conv-probe ceilings, geometry
    floors) are deterministic given (code version, device kind, inputs), so
    they are cached as sidecar JSON in .bench_weights — the r4 warm bench
    re-measured them every run and blew its wall-clock budget (1522 s vs
    1200). The cached *value* is still a real measurement from this chip;
    only the repeat cost is skipped."""
    try:
        with open(os.path.join(BENCH_WEIGHTS_DIR, name)) as f:
            d = json.load(f)
        if d.get("key") == key:
            return d["value"]
    except Exception:
        pass
    return None


def _receipt_save(name, key, value):
    try:
        os.makedirs(BENCH_WEIGHTS_DIR, exist_ok=True)
        with open(os.path.join(BENCH_WEIGHTS_DIR, name), "w") as f:
            json.dump({"key": key, "value": value}, f)
    except Exception:
        pass  # cache is an optimization; never fail the bench over it


def _scene_pool_cached(scene_pool, n, h, w, seed, np, log):
    """scene_pool() renders on the single host core (~90 s for the 32-scene
    1024x2048 pool); the pool is a pure function of (n, h, w, seed, code), so
    cache the arrays as an uncompressed npz next to the weights."""
    path = os.path.join(
        BENCH_WEIGHTS_DIR, f"scene_pool_v{_RECEIPT_VERSION}_{n}x{h}x{w}_s{seed}.npz"
    )
    if os.path.exists(path):
        try:
            z = np.load(path)
            return tuple(z[k] for k in ("imgs", "labels", "disps", "rw", "f2f"))
        except Exception as e:
            log(f"scene pool cache unreadable ({type(e).__name__}); re-rendering")
    imgs, labels, disps, rw, f2f = scene_pool(n, h, w, seed=seed)
    try:
        os.makedirs(BENCH_WEIGHTS_DIR, exist_ok=True)
        np.savez(path, imgs=imgs, labels=labels, disps=disps, rw=rw, f2f=f2f)
    except Exception:
        pass
    return imgs, labels, disps, rw, f2f

# Peak dense bf16 TFLOP/s per chip by device_kind substring (public specs).
_PEAK_TFLOPS = [
    ("v6", 918.0),  # Trillium
    ("v5p", 459.0),
    ("v5e", 394.0),
    ("v5 lite", 394.0),
    ("v4", 275.0),
    ("v3", 123.0),
    ("v2", 45.0),
]


def _peak_flops(device) -> float:
    kind = getattr(device, "device_kind", "").lower()
    for key, tf in _PEAK_TFLOPS:
        if key in kind:
            return tf * 1e12
    return 394.0e12  # assume v5e (the driver's target part)


def _measured_peak(jnp, jax, np, windows=5):
    """Sustained big-matmul bf16 TFLOP/s on THIS chip/stack — the honest MFU
    denominator. The matmuls are CHAINED (each consumes the previous result
    inside a fori_loop) so the ~5 ms dispatch / ~30 ms fetch overheads of the
    dev relay are amortized over the whole chain; a naive per-call probe on
    this relay under-reads the ceiling ~2x.

    Returns (median_flops_per_s, spread) over ``windows`` short windows —
    MEDIAN, not best-of-2 long runs: the shared dev chip's tenancy made the
    best-of probe swing 106.9 -> 161 TF/s across rounds (VERDICT r4 #8);
    the median of several short windows is stable and ``spread`` =
    (max - min) / median records the tenancy noise it was taken under."""
    try:
        n, iters = 8192, 16
        key = jax.random.PRNGKey(0)
        a = jax.random.normal(key, (n, n), jnp.bfloat16)
        b = jax.random.normal(key, (n, n), jnp.bfloat16)

        @jax.jit
        def chain(x, y):
            def body(_, acc):
                z = jnp.dot(acc, y, preferred_element_type=jnp.float32)
                return (z * (1.0 / n)).astype(jnp.bfloat16)  # keep finite

            return jax.lax.fori_loop(0, iters, body, x)

        np.asarray(chain(a, b).ravel()[:1])  # compile
        samples = []
        for _ in range(windows):
            t0 = time.time()
            np.asarray(chain(a, b).ravel()[:1])
            samples.append((time.time() - t0) / iters)
        per_iter = np.median(samples)
        spread = (max(samples) - min(samples)) / per_iter
        return 2 * n**3 / per_iter, float(spread)
    except Exception:
        return None, None


def _compiled_flops(jitted, *args):
    """FLOPs of one call from XLA's cost analysis of the lowered module."""
    try:
        cost = jitted.lower(*args).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        f = float(cost.get("flops", -1.0))
        return f if f > 0 else None
    except Exception:
        return None


# ---------------------------------------------------------------------------
# Conv-roofline receipts (VERDICT r3 #4)


def _collect_convs(jaxpr, out):
    """Walk a jaxpr (recursing into pjit/scan/cond sub-jaxprs) and record
    every conv_general_dilated's shape + analytic FLOPs."""
    import numpy as np

    for eqn in jaxpr.eqns:
        if eqn.primitive.name == "conv_general_dilated":
            lhs = eqn.invars[0].aval
            rhs = eqn.invars[1].aval
            o = eqn.outvars[0].aval
            dn = eqn.params["dimension_numbers"]
            cout = rhs.shape[dn.rhs_spec[0]]
            cin = rhs.shape[dn.rhs_spec[1]]  # per feature group
            ks = tuple(int(rhs.shape[d]) for d in dn.rhs_spec[2:])
            b = int(o.shape[dn.out_spec[0]])
            out_hw = tuple(int(o.shape[d]) for d in dn.out_spec[2:])
            lhs_hw = tuple(int(lhs.shape[d]) for d in dn.lhs_spec[2:])
            flops = 2.0 * b * float(np.prod(out_hw)) * float(np.prod(ks)) * cin * cout
            out.append(
                {
                    "cin": int(cin),
                    "cout": int(cout),
                    "k": ks,
                    "b": b,
                    "out_hw": out_hw,
                    "lhs_hw": lhs_hw,
                    "stride": tuple(eqn.params["window_strides"]),
                    "lhs_dilation": tuple(eqn.params["lhs_dilation"]),
                    "flops": flops,
                }
            )
        for v in eqn.params.values():
            for sub in v if isinstance(v, (list, tuple)) else (v,):
                inner = getattr(sub, "jaxpr", None)
                if inner is not None and hasattr(inner, "eqns"):
                    _collect_convs(inner, out)
                elif hasattr(sub, "eqns"):
                    _collect_convs(sub, out)


_PROBE_LADDER = (8, 64, 512, 4096, 32768)


def _probe_conv_class(rec, jax, jnp, np):
    """Sustained TF/s of one conv shape class by TWO-POINT chained timing.

    The class runs as a fori_loop of N chained convs (the scalar carry feeds
    back into the input so XLA cannot overlap or elide iterations) for
    increasing ladder N until the call comfortably outlasts timing noise;
    per-iteration time is the DIFFERENCE between successive ladder timings,
    so the constant dispatch+fetch overhead of this tunneled host->TPU relay
    cancels exactly. (The r4 probes timed a single 12-iteration call, so a
    ~100 ms round trip swamped every sub-millisecond conv class — shapes the
    fused program demonstrably executes faster probed at 1-4 TF/s and the
    'ceiling' fraction blew past 4x.) Ladder values are fixed so the
    compiled programs hit the persistent compilation cache across runs.
    Returns TF/s or None."""
    import jax.lax as lax

    b = min(rec["b"], 8)
    h, w = rec["lhs_hw"]
    kh, kw = rec["k"]
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (b, h, w, rec["cin"]), jnp.bfloat16)
    kern = jax.random.normal(key, (kh, kw, rec["cin"], rec["cout"]), jnp.bfloat16)
    dn = lax.conv_dimension_numbers(x.shape, kern.shape, ("NHWC", "HWIO", "NHWC"))
    if rec["lhs_dilation"] == (1, 1):
        pad = "SAME"
    else:
        # transposed conv: explicit padding sized so out = in * lhs_dilation
        # (string padding is rejected with lhs_dilation)
        pad = []
        for kk, d in zip(rec["k"], rec["lhs_dilation"]):
            total = max(kk - 2 + d, 0)
            pad.append((total // 2, total - total // 2))

    def make_run(iters):
        @jax.jit
        def run(x, kern):
            def body(_, acc):
                xx = x * (1.0 + acc * 1e-30).astype(jnp.bfloat16)
                y = lax.conv_general_dilated(
                    xx, kern, rec["stride"], pad,
                    lhs_dilation=rec["lhs_dilation"], dimension_numbers=dn,
                )
                # the carry must consume EVERY output element: a single-pixel
                # carry (y[...,0]) lets XLA slice the conv down to one output
                # column, and the ladder differencing then reports absurd
                # >100 PF/s "ceilings" (observed). A full-output sum is work
                # the real program pays anyway (outputs are materialized or
                # fused into consumers), so it belongs in the ceiling.
                return jnp.sum(y, dtype=jnp.float32)

            return lax.fori_loop(0, iters, body, jnp.float32(0.0))

        return run

    out_hw = (
        h * rec["lhs_dilation"][0] // rec["stride"][0],
        w * rec["lhs_dilation"][1] // rec["stride"][1],
    )
    flops = 2.0 * b * out_hw[0] * out_hw[1] * kh * kw * rec["cin"] * rec["cout"]

    prev_iters = prev_t = None
    per_iter = None
    for iters in _PROBE_LADDER:
        run = make_run(iters)
        np.asarray(run(x, kern))  # compile
        t = float("inf")
        for _ in range(2):
            t0 = time.time()
            np.asarray(run(x, kern))
            t = min(t, time.time() - t0)
        if prev_iters is not None and t > prev_t:
            per_iter = (t - prev_t) / (iters - prev_iters)
        prev_iters, prev_t = iters, t
        # stop escalating once the call itself dwarfs dispatch noise AND a
        # difference estimate exists (big conv classes stop at the first or
        # second rung; only microsecond classes walk the whole ladder)
        if t >= 0.25 and per_iter is not None:
            break
        # a multi-second call is already >95% compute on this ~100 ms relay;
        # don't escalate to a rung that would run minutes just to difference
        if t >= 4.0:
            break
    if per_iter is None or per_iter <= 0:
        # degenerate timing (noise made the longer call look faster):
        # fall back to the overhead-inclusive lower bound
        per_iter = prev_t / prev_iters
    return flops / per_iter


def _conv_roofline(jitted_fn, args, jax, jnp, np, log, time_left,
                   max_classes=24, dev_kind=""):
    """(receipts dict or None). Groups the program's convs by
    (cin, cout, k, stride, lhs_dilation), probes the top FLOP classes, and
    returns the FLOP-weighted harmonic-mean ceiling + per-class receipts.

    The receipt also carries ``conv_total_flops`` (every conv in the program,
    probed or not) so the caller can form a TRUE conv-roofline fraction —
    conv FLOPs over conv ceiling — instead of mixing whole-program FLOPs
    into a conv-only denominator (ADVICE r4; the r4 record's
    frac_of_weighted_ceiling = 1.583 partly reflected that mixing).
    max_classes=24 targets probe FLOP coverage >= 0.9 (VERDICT r4 #2; 8
    classes covered only 0.656): probes run most-FLOPs-first and stop early
    only on budget, and unprobed classes are assumed AT the weighted ceiling
    (``conv_probe_flop_coverage`` records how much is assumption)."""
    convs = []
    _collect_convs(jax.make_jaxpr(jitted_fn)(*args).jaxpr, convs)
    if not convs:
        return None
    groups = {}
    for c in convs:
        key = (c["cin"], c["cout"], c["k"], c["stride"], c["lhs_dilation"])
        g = groups.setdefault(key, {"flops": 0.0, "rec": c})
        g["flops"] += c["flops"]
    total = sum(g["flops"] for g in groups.values())
    ranked = sorted(groups.items(), key=lambda kv: -kv[1]["flops"])

    # sidecar cache: ceilings are a property of (chip, conv classes, probe
    # methodology), not of the weights — skip the ~5 min re-probe on warm runs
    sig = ";".join(
        f"{k[0]}x{k[1]}k{k[2]}s{k[3]}d{k[4]}:{g['flops']:.3g}"
        for k, g in ranked[:max_classes]
    )
    cache_key = f"v{_RECEIPT_VERSION}|{dev_kind}|{sig}"
    cached = _receipt_load("conv_probe_receipts.json", cache_key)
    if cached is not None:
        log("[bench] conv probe receipts loaded from sidecar cache")
        return cached

    probed = []
    for key, g in ranked[:max_classes]:
        if time_left() < 120:
            log("conv probes stopped early: bench budget low")
            break
        if sum(f for _, f, _ in probed) >= 0.95 * total:
            # the ceiling is FLOP-weighted: classes beyond 95% cumulative
            # coverage move it by <5% worst-case but each costs a ladder of
            # compiles over this ~100 ms relay — stop at the receipts target
            log("conv probes stopped: FLOP coverage target reached")
            break
        try:
            tfs = _probe_conv_class(g["rec"], jax, jnp, np)
        except Exception as e:
            log(f"conv probe {key} failed: {type(e).__name__}: {e}")
            continue
        if tfs:
            cin, cout, k, stride, dil = key
            spec_peak = next(
                (tf * 1e12 for sub, tf in _PEAK_TFLOPS if sub in dev_kind), None
            )
            if spec_peak and tfs > 1.5 * spec_peak:
                # timing artifact (elided work / clock skew): a class cannot
                # beat the chip's dense-bf16 spec — better no receipt than a
                # fabricated one
                log(f"  conv probe {cin}->{cout} k{k} DROPPED: "
                    f"{tfs / 1e12:.0f} TF/s exceeds spec peak")
                continue
            probed.append((key, g["flops"], tfs))
            log(f"  conv probe {cin}->{cout} k{k} s{stride} dil{dil}: "
                f"{tfs / 1e12:.1f} TF/s ({100 * g['flops'] / total:.1f}% of conv FLOPs)")
    if not probed:
        return None
    probed_flops = sum(f for _, f, _ in probed)
    ceiling = probed_flops / sum(f / tfs for _, f, tfs in probed)
    receipts = {
        "conv_weighted_ceiling_tflops": round(ceiling / 1e12, 2),
        "conv_probe_flop_coverage": round(probed_flops / total, 3),
        "conv_total_flops": total,
        "conv_probe_tflops": {
            f"{cin}x{cout}k{k[0]}s{s[0]}d{d[0]}": round(tfs / 1e12, 2)
            for (cin, cout, k, s, d), _, tfs in probed
        },
    }
    # only a COMPLETE probe pass is worth replaying into future records
    if probed_flops / total >= 0.9:
        _receipt_save("conv_probe_receipts.json", cache_key, receipts)
    return receipts


# ---------------------------------------------------------------------------


def _run_trials(pipe, batches, n_batches_per_trial, trials):
    """Returns (best_fps, mean_fps, std_fps) over ``trials`` timed trials."""
    import numpy as np

    batch = batches[0].shape[0]

    fps_samples = []
    for _ in range(trials):
        t0 = time.time()
        # Keep only the dist_rw handle per batch: dispatch stays fully async
        # but the big FrameOutputs buffers (clouds, overlays, disparity) are
        # released as soon as each program finishes instead of accumulating
        # across the whole trial — at full res that is ~GBs of HBM.
        dists = [
            pipe.process_batch(batches[i % len(batches)]).dist_rw
            for i in range(n_batches_per_trial)
        ]
        scalars = [np.asarray(d) for d in dists]  # one small transfer per batch
        del dists, scalars
        dt = time.time() - t0
        fps_samples.append(batch * n_batches_per_trial / dt)
    fps = np.asarray(fps_samples)
    return float(fps.max()), float(fps.mean()), float(fps.std())


def _upload_trial(pipe, host_pool, jax, jnp, np, n_batches=4):
    """Throughput with each uint8 batch device_put INSIDE the timed loop —
    the resident-pool headline's caveat as a measured number — plus the raw
    host->device bandwidth it implies (VERDICT r3 #5)."""
    host_batches = [
        np.ascontiguousarray(host_pool[i * BATCH : (i + 1) * BATCH])
        for i in range(min(n_batches, host_pool.shape[0] // BATCH))
    ]
    # raw upload bandwidth of one batch
    nbytes = host_batches[0].nbytes
    t0 = time.time()
    buf = jax.device_put(host_batches[0])
    buf.block_until_ready()
    upload_mbps = nbytes / (time.time() - t0) / 1e6
    del buf
    t0 = time.time()
    dists = [
        pipe.process_batch(jax.device_put(hb)).dist_rw for hb in host_batches
    ]
    _ = [np.asarray(d) for d in dists]
    dt = time.time() - t0
    return BATCH * len(host_batches) / dt, upload_mbps


def _upload_trial_overlapped(pipe, host_pool, jax, np, n_batches=4):
    """Upload-inclusive throughput with a DOUBLE-BUFFERED prefetcher: a
    worker thread device_puts batch N+1 while batch N computes (VERDICT r4
    #5 — the serial trial conflates link bandwidth with pipeline design).
    On this dev relay the link (~30 MB/s for a 48 MB batch) dwarfs compute
    (~30 ms), so the overlapped number stays ~link-bound; on a PCIe-class
    host (~25 GB/s) the same loop hides the ~2 ms upload entirely. The
    recorded serial/overlapped PAIR is what makes that claim checkable."""
    import concurrent.futures as cf

    host_batches = [
        np.ascontiguousarray(host_pool[i * BATCH : (i + 1) * BATCH])
        for i in range(min(n_batches, host_pool.shape[0] // BATCH))
    ]
    with cf.ThreadPoolExecutor(max_workers=1) as ex:
        t0 = time.time()
        fut = ex.submit(jax.device_put, host_batches[0])
        dists = []
        for i in range(len(host_batches)):
            dev = fut.result()
            if i + 1 < len(host_batches):
                fut = ex.submit(jax.device_put, host_batches[i + 1])
            # dispatch is async: the next upload proceeds while this runs
            dists.append(pipe.process_batch(dev).dist_rw)
        _ = [np.asarray(d) for d in dists]
        dt = time.time() - t0
    return BATCH * len(host_batches) / dt


def _decode_trial(pipe, host_pool, jax, np, n_batches=4):
    """The north star's full clause measured: JPEG bytes -> road-width
    scalar (VERDICT r4 #4). Pool scenes are JPEG-encoded once (untimed —
    that is the camera/file feed's job), then the timed loop THREAD-
    PREFETCHES decode+upload of batch N+1 while batch N computes (the same
    overlap cli.common.prefetch_decoded gives the sequence entry). Entropy
    decode stays host-side by design on TPU — DESIGN.md "Decode"."""
    import concurrent.futures as cf
    import io

    from PIL import Image

    n = min(n_batches * BATCH, host_pool.shape[0])
    jpegs = []
    for i in range(n):
        buf = io.BytesIO()
        Image.fromarray(host_pool[i]).save(buf, format="JPEG", quality=90)
        jpegs.append(buf.getvalue())
    nb = n // BATCH

    def decode_batch(k):
        arrs = [
            np.asarray(Image.open(io.BytesIO(jpegs[k * BATCH + i])).convert("RGB"))
            for i in range(BATCH)
        ]
        return jax.device_put(np.stack(arrs))

    with cf.ThreadPoolExecutor(max_workers=1) as ex:
        t0 = time.time()
        fut = ex.submit(decode_batch, 0)
        dists = []
        for k in range(nb):
            dev = fut.result()
            if k + 1 < nb:
                fut = ex.submit(decode_batch, k + 1)
            dists.append(pipe.process_batch(dev).dist_rw)
        _ = [np.asarray(d) for d in dists]
        dt = time.time() - t0
    return BATCH * nb / dt


def _accuracy(pipe, batches, rw_true, f2f_true=None):
    """finite_frac + rw MAE (and, when truth is given, fence-to-fence MAE —
    the reference's 'advanced' approach, semantic_depth.py:273-334) over the
    distinct pool scenes (one pass)."""
    import numpy as np

    # retain only the two scalar vectors per batch (not whole FrameOutputs)
    outs = [
        (o.dist_rw, o.dist_f2f) for o in (pipe.process_batch(b) for b in batches)
    ]
    widths = np.concatenate([np.asarray(o[0]) for o in outs])
    rw_true = np.asarray(rw_true)[: widths.size]
    finite = np.isfinite(widths)
    finite_frac = float(finite.mean())
    mae = float(np.abs(widths[finite] - rw_true[finite]).mean()) if finite.any() else None
    f2f_mae = None
    if f2f_true is not None:
        f2f = np.concatenate([np.asarray(o[1]) for o in outs])
        f2f_true = np.asarray(f2f_true)[: f2f.size]
        ff = np.isfinite(f2f)
        f2f_mae = float(np.abs(f2f[ff] - f2f_true[ff]).mean()) if ff.any() else None
    return finite_frac, mae, f2f_mae


def _geometry_floor(cfg, imgs, labels, disps, rw_true, jax, jnp, np, batch=4):
    """rw MAE of the fused GEOMETRY on PERFECT network outputs (VERDICT r4
    #1a): the scene pool's analytic masks + analytic disparity (the exact
    training targets a flawless net would reproduce, including the scenes'
    0.1% rendered depth noise) through ``_frame_geometry`` — denoise chain,
    plane fit and the configured rw estimator — with no networks. The result
    is the measured rasterization/geometry floor of the accuracy protocol:
    the recorded *_rw_mae_m can be read as floor + net-quality gap."""
    from semantic_depth_tpu import pipeline as pl

    class _Geom:  # _frame_geometry needs only .config from its instance
        config = cfg

    cam, s_w = pl._scaled_camera(cfg, cfg.camera.focal)
    # scene_pool renders disp_norm = d_px / (2048 * s_w)
    # (utils/bench_scenes.py render_scene); the pipeline's scaling for these
    # pools resolves to the same factor, so this recovers pixel disparity
    mult = jnp.float32(2048.0 * s_w)

    @jax.jit
    def geom(small, road_m, fence_m, disp_norm):
        def one(fs, rm, fm, d):
            return pl.SemanticDepthPipeline._frame_geometry(
                _Geom(), fs, rm, fm, d * mult, cam
            ).dist_rw

        return jax.vmap(one)(small, road_m, fence_m, disp_norm)

    widths = []
    n = imgs.shape[0]
    for i in range(0, n - n % batch, batch):
        widths.append(
            np.asarray(
                geom(
                    jnp.asarray(imgs[i : i + batch], jnp.float32),
                    jnp.asarray(labels[i : i + batch] == 7),
                    jnp.asarray(labels[i : i + batch] == 13),
                    jnp.asarray(disps[i : i + batch]),
                )
            )
        )
    widths = np.concatenate(widths)
    truth = np.asarray(rw_true)[: widths.size]
    fin = np.isfinite(widths)
    return float(np.abs(widths[fin] - truth[fin]).mean()) if fin.any() else None


def _load_bench_weights(fcn, mono, h, w, log, full_res=False, native=False,
                        train=True, deadline=None):
    """Trained scene weights (train-on-first-run, cached); random fallback.
    full_res=True loads the set fine-tuned at native 1024x2048 (a 256x512
    net collapses on full-res inputs); native=True loads the input_s2d
    variant's set — see tools/train_bench_weights.py. train=False never
    trains: it loads the cached set if present, else returns random (used
    after a training attempt already failed this run — re-attempting the
    same doomed training per leg would burn chip-hours for nothing).
    deadline bounds any training (see ensure_bench_weights)."""
    import jax
    import jax.numpy as jnp

    from semantic_depth_tpu.models import weights as weights_lib

    fcn_t = fcn.init(jax.random.PRNGKey(0), jnp.zeros((1, h, w, 3), jnp.float32))
    mono_t = mono.init(jax.random.PRNGKey(1), jnp.zeros((2, h, w, 3), jnp.float32))
    try:
        from tools.train_bench_weights import bench_weight_paths, ensure_bench_weights

        if train:
            fcn_path, mono_path = ensure_bench_weights(
                BENCH_WEIGHTS_DIR, full_res=full_res, native=native, log=log,
                deadline=deadline,
            )
        else:
            fcn_path, mono_path = bench_weight_paths(
                BENCH_WEIGHTS_DIR, full_res=full_res, native=native
            )
            if not (os.path.exists(fcn_path) and os.path.exists(mono_path)):
                log("no cached bench weights and training disabled; random weights")
                return fcn_t, mono_t, "random"
        return (
            weights_lib.load_params(fcn_t, fcn_path),
            weights_lib.load_params(mono_t, mono_path),
            "trained",
        )
    except Exception as e:
        log(f"bench-weight training failed ({type(e).__name__}: {e}); random weights")
        return fcn_t, mono_t, "random"


def main():
    import numpy as np

    from semantic_depth_tpu.runtime import setup_cache

    setup_cache()

    import jax
    import jax.numpy as jnp

    from semantic_depth_tpu.config import munich_pipeline_config
    from semantic_depth_tpu.models import FCN8s, Monodepth
    from semantic_depth_tpu.pipeline import SemanticDepthPipeline
    from semantic_depth_tpu.utils.bench_scenes import scene_pool

    def log(*a):
        print(*a, file=sys.stderr, flush=True)

    t_start = time.time()
    deadline = t_start + BUDGET_S

    def time_left():
        return deadline - time.time()

    dev = jax.devices()[0]
    peak = _peak_flops(dev)

    # stage markers on stderr: when the driver's budget kills this process,
    # the tail of stderr says exactly where the time went
    log(f"[bench] start; budget {BUDGET_S:.0f}s; device {dev.device_kind}")

    cfg = munich_pipeline_config(compute_dtype="bfloat16")
    fcn = FCN8s(num_classes=cfg.segmenter.num_classes, compute_dtype=jnp.bfloat16)
    mono = Monodepth(encoder=cfg.monodepth.encoder, compute_dtype=jnp.bfloat16)
    h, w = cfg.input_height, cfg.input_width
    fcn_params, mono_params, weight_mode = _load_bench_weights(
        fcn, mono, h, w, log, deadline=deadline
    )
    log(f"[bench] weights ready ({weight_mode}) at {time.time()-t_start:.0f}s")
    pipe = SemanticDepthPipeline(cfg, fcn_params, mono_params, fcn=fcn, mono=mono)

    n_pool = POOL_BATCHES * BATCH
    pool, pool_labels, pool_disps, rw_true, f2f_true = _scene_pool_cached(
        scene_pool, n_pool, 1024, 2048, 0, np, log
    )
    batches = [
        jax.device_put(jnp.asarray(pool[i * BATCH : (i + 1) * BATCH]))
        for i in range(POOL_BATCHES)
    ]
    log(f"[bench] scene pool resident at {time.time()-t_start:.0f}s")

    # warmup (compile + cache) and FLOP accounting on the same executable
    _ = np.asarray(pipe.process_batch(batches[0]).dist_rw)
    log(f"[bench] headline program warm at {time.time()-t_start:.0f}s")
    mult = jnp.float32(cfg.disparity_multiplier or 2048.0)
    batch_args = (
        pipe.fcn_params, pipe.mono_params, batches[0],
        jnp.float32(cfg.camera.focal), mult,
    )
    flops_per_batch = _compiled_flops(pipe._process_batch, *batch_args)

    n_batches = max(1, (FRAMES_PER_TRIAL + BATCH - 1) // BATCH)
    best_fps, mean_fps, std_fps = _run_trials(pipe, batches, n_batches, TRIALS)
    finite_frac, rw_mae, f2f_mae = _accuracy(pipe, batches, rw_true, f2f_true)

    mfu = None
    flops_per_frame = None
    measured_peak, peak_spread = (
        _measured_peak(jnp, jax, np) if time_left() > 90 else (None, None)
    )
    if flops_per_batch:
        flops_per_frame = flops_per_batch / BATCH
        mfu = flops_per_frame * best_fps / peak

    out = {
        "metric": "end-to-end fps/chip, 1024x2048 frame -> road-width scalar",
        "value": round(best_fps, 3),
        "unit": "fps",
        "vs_baseline": round(best_fps / REFERENCE_FPS, 2),
        "mean_fps": round(mean_fps, 3),
        "best_fps": round(best_fps, 3),
        "std_fps": round(std_fps, 3),
        "frames_per_trial": n_batches * BATCH,
        "trials": TRIALS,
        "device_kind": getattr(dev, "device_kind", str(dev)),
        "weights": weight_mode,
        "finite_frac": round(finite_frac, 4),
        "stage": "headline",
    }
    if rw_mae is not None:
        out["rw_mae_m"] = round(rw_mae, 4)
    if f2f_mae is not None:
        out["f2f_mae_m"] = round(f2f_mae, 4)
    if mfu is not None:
        out["mfu"] = round(mfu, 4)
        out["model_gflops_per_frame"] = round(flops_per_frame / 1e9, 1)
        if measured_peak:
            out["measured_peak_matmul_tflops"] = round(measured_peak / 1e12, 1)
            out["measured_peak_spread"] = round(peak_spread, 3)
            out["mfu_vs_measured_peak"] = round(
                flops_per_frame * best_fps / measured_peak, 4
            )
    # The safety-net record: a driver killing the process during the legs
    # below still finds this complete line in the tail of stdout.
    print(json.dumps(out), flush=True)
    log(f"[bench] headline JSON emitted at {time.time()-t_start:.0f}s")

    # ---- upload-inclusive trials (VERDICT r3 #5; r4 #5 overlapped) ----
    try:
        fps_up, upload_mbps = _upload_trial(pipe, pool, jax, jnp, np)
        out["fps_with_upload"] = round(fps_up, 3)
        out["upload_mbps"] = round(upload_mbps, 1)
    except Exception as e:
        log(f"upload trial skipped: {type(e).__name__}: {e}")
    try:
        out["fps_with_upload_overlapped"] = round(
            _upload_trial_overlapped(pipe, pool, jax, np), 3
        )
    except Exception as e:
        log(f"overlapped upload trial skipped: {type(e).__name__}: {e}")
    # ---- JPEG-to-scalar trial (VERDICT r4 #4: the north star's decode
    # clause as a measured number) ----
    try:
        out["fps_with_decode"] = round(_decode_trial(pipe, pool, jax, np), 3)
    except Exception as e:
        log(f"decode trial skipped: {type(e).__name__}: {e}")

    # ---- conv-roofline receipts (VERDICT r3 #4) ----
    if time_left() > 180:
        try:
            receipts = _conv_roofline(
                pipe._process_batch, batch_args, jax, jnp, np, log, time_left,
                dev_kind=getattr(dev, "device_kind", str(dev)),
            )
            if receipts:
                conv_total_flops = receipts.pop("conv_total_flops")
                out.update(receipts)
                # TRUE conv roofline fraction: conv-only FLOPs sustained by
                # the program over the conv-probe ceiling (ADVICE r4 — the
                # old numerator included the ~17% non-conv program FLOPs,
                # so the 'fraction of conv roofline' was not one)
                conv_flops_per_frame = conv_total_flops / BATCH
                out["conv_gflops_per_frame"] = round(conv_flops_per_frame / 1e9, 1)
                out["frac_of_weighted_ceiling"] = round(
                    conv_flops_per_frame * best_fps
                    / (receipts["conv_weighted_ceiling_tflops"] * 1e12), 3
                )
        except Exception as e:
            log(f"conv roofline receipts skipped: {type(e).__name__}: {e}")
    else:
        log("conv roofline receipts skipped: bench budget low")

    # ---- native full-resolution path (1024x2048 through the networks) ----
    # Free the headline pipeline's device state first: the full-res program's
    # peak live set (bf16 encoder pyramids + f32 geometry planes at 16x the
    # pixels) plus a second full weight set does not fit 16 GB HBM alongside
    # the batch-8 pool. gc + clear_caches drop lingering executables and any
    # device constants they captured — without this the from-scratch run
    # (which also TRAINS the full-res sets in-process) RESOURCE_EXHAUSTs.
    import gc

    del batches
    del pipe
    del fcn_params, mono_params
    del batch_args  # holds refs to the params and a pool batch
    gc.collect()
    jax.clear_caches()
    cfg_fr = munich_pipeline_config(
        compute_dtype="bfloat16", input_height=1024, input_width=2048
    )

    import dataclasses

    # The scene-trained native set doesn't need the reference's flip-average
    # crutch (disocclusion compensation for the published weights) — skipping
    # it halves the mono cost; the accuracy leg below MEASURES the effect
    # (full_res_rw_mae_m), so the claim is carried by evidence, not assertion.
    # rw_estimator='plane_edge' (ops/pcl.plane_edge_width): the native mode
    # reads width off the FITTED ROAD PLANE + mask-edge line fits instead of
    # the reference's min/max-x extreme over measured slab points — the
    # slab extreme eats the disparity net's per-pixel noise; the floor legs
    # below record both estimators' geometry floors so the delta is measured
    cfg_fr_native = dataclasses.replace(
        cfg_fr,
        monodepth=dataclasses.replace(cfg_fr.monodepth, flip_average=False),
        rw_estimator="plane_edge",
    )

    # ---- measured geometry floors of the accuracy protocol (VERDICT r4
    # #1a): perfect masks + analytic disparity through the fused geometry —
    # what a FLAWLESS network would score. Decomposes every *_rw_mae_m into
    # floor + net-quality gap.
    floors_key = (
        f"v{_RECEIPT_VERSION}|{getattr(dev, 'device_kind', str(dev))}"
        f"|pool{n_pool}x1024x2048s0"
    )
    cached_floors = _receipt_load("geometry_floors.json", floors_key)
    if cached_floors is not None:
        out.update(cached_floors)
        log("[bench] geometry floors loaded from sidecar cache: "
            f"{cached_floors}")
    elif time_left() > 150:
        floors = {}
        try:
            floor_pe = _geometry_floor(
                cfg_fr_native, pool, pool_labels, pool_disps, rw_true, jax, jnp, np
            )
            if floor_pe is not None:
                floors["floor_rw_mae_m"] = round(floor_pe, 4)
            floor_slab = _geometry_floor(
                dataclasses.replace(cfg_fr_native, rw_estimator="slab_minmax"),
                pool, pool_labels, pool_disps, rw_true, jax, jnp, np,
            )
            if floor_slab is not None:
                floors["floor_rw_mae_slab_m"] = round(floor_slab, 4)
            log(f"[bench] geometry floors at {time.time()-t_start:.0f}s: "
                f"plane_edge {floor_pe}, slab_minmax {floor_slab}")
        except Exception as e:
            log(f"geometry floor legs skipped: {type(e).__name__}: {e}")
        try:
            # the headline 256x512 protocol's floor (VERDICT r4 #3: is the
            # recorded rw_mae_m the resolution's floor or undertraining?)
            p256, l256, d256, rw256, _ = _scene_pool_cached(
                scene_pool, 16, 256, 512, 0, np, log
            )
            floor_256 = _geometry_floor(
                cfg, p256, l256, d256, rw256, jax, jnp, np, batch=8
            )
            if floor_256 is not None:
                floors["floor_rw_mae_256_m"] = round(floor_256, 4)
                log(f"[bench] 256x512 slab floor: {floor_256}")
        except Exception as e:
            log(f"256x512 floor leg skipped: {type(e).__name__}: {e}")
        out.update(floors)
        if len(floors) == 3:  # cache only a complete pass
            _receipt_save("geometry_floors.json", floors_key, floors)
    else:
        log("geometry floor legs skipped: bench budget low")

    def full_res_leg(fcn_fr, mono_fr, *, native, fr_batch, n_frames, trials):
        """One full-res measurement: build the pipe, time, score accuracy.
        Training is attempted only when the headline training succeeded —
        when it already failed this run, the leg loads the cache or runs
        random-weight (and says so in the returned mode)."""
        fcn_p, mono_p, leg_mode = _load_bench_weights(
            fcn_fr, mono_fr, h, w, log,
            full_res=True, native=native, train=(weight_mode == "trained"),
            deadline=deadline,
        )
        cfg_leg = cfg_fr_native if native else cfg_fr
        pipe_fr = SemanticDepthPipeline(cfg_leg, fcn_p, mono_p, fcn=fcn_fr, mono=mono_fr)
        fr_batches = [
            jax.device_put(jnp.asarray(pool[i * fr_batch : (i + 1) * fr_batch]))
            for i in range(min(4, max(1, n_pool // fr_batch)))
        ]
        _ = np.asarray(pipe_fr.process_batch(fr_batches[0]).dist_rw)  # warmup
        fps, _, _ = _run_trials(pipe_fr, fr_batches, max(1, n_frames // fr_batch), trials)
        fin, mae, fmae = _accuracy(pipe_fr, fr_batches, rw_true, f2f_true)
        return fps, fin, mae, fmae, leg_mode

    # The NATIVE path: input_s2d trunks (bijective 2x2 pixel packing, learned
    # depth_to_space heads — models/fcn8s.py + models/monodepth.py docs).
    # Dense evaluation at 1024x2048 is roofline-capped below the 30 fps bar
    # (DESIGN.md); this is the architecture the full-res mode ships.
    full_res_fps = None
    fr_finite = fr_mae = fr_f2f_mae = fr_mode = None
    fcn_n = FCN8s(num_classes=cfg.segmenter.num_classes,
                  compute_dtype=jnp.bfloat16, input_s2d=True)
    mono_n = Monodepth(encoder=cfg.monodepth.encoder,
                       compute_dtype=jnp.bfloat16, input_s2d=True)
    # the packed trunks use ~4x less activation memory than dense, so try
    # batch 8 first and fall back if this chip's HBM is tight
    for fr_batch in (2 * FULL_RES_BATCH, FULL_RES_BATCH):
        if time_left() < 150:
            log("native full-res leg skipped: bench budget low")
            break
        log(f"[bench] native full-res leg (batch {fr_batch}) at "
            f"{time.time()-t_start:.0f}s")
        try:
            full_res_fps, fr_finite, fr_mae, fr_f2f_mae, fr_mode = full_res_leg(
                fcn_n, mono_n, native=True,
                fr_batch=fr_batch, n_frames=2 * fr_batch, trials=2,
            )
            break
        except Exception as e:  # full-res is a capability line, not the headline
            log(f"native full-res bench at batch {fr_batch} skipped: "
                f"{type(e).__name__}: {e}")
            gc.collect()
            jax.clear_caches()  # drop the failed attempt's device state

    # The DENSE path (unmodified reference architecture at 1024x2048),
    # reported for transparency next to the native number.
    gc.collect()
    jax.clear_caches()  # the native leg's executables/constants
    full_res_dense_fps = None
    fr_dense_mode = None
    if time_left() > 120:
        try:
            full_res_dense_fps, _, _, _, fr_dense_mode = full_res_leg(
                fcn, mono, native=False,
                fr_batch=FULL_RES_BATCH, n_frames=FULL_RES_BATCH, trials=1,
            )
        except Exception as e:
            log(f"dense full-res bench skipped: {type(e).__name__}: {e}")
    else:
        log("dense full-res leg skipped: bench budget low")

    if full_res_fps is not None:
        out["full_res_fps"] = round(full_res_fps, 3)
        out["full_res_vs_baseline"] = round(full_res_fps / REFERENCE_FPS, 2)
        # a random-weight fps must not read as a trained-architecture number
        out["full_res_weights"] = fr_mode
        if fr_finite is not None:
            out["full_res_finite_frac"] = round(fr_finite, 4)
        if fr_mae is not None:
            out["full_res_rw_mae_m"] = round(fr_mae, 4)
        if fr_f2f_mae is not None:
            out["full_res_f2f_mae_m"] = round(fr_f2f_mae, 4)
    if full_res_dense_fps is not None:
        out["full_res_dense_fps"] = round(full_res_dense_fps, 3)
        out["full_res_dense_weights"] = fr_dense_mode
    out["stage"] = "final"
    out["bench_wall_s"] = round(time.time() - t_start, 1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
