"""Benchmark: encode+decode throughput vs the reference SZ3 binary.

Prints ONE JSON line:
  {"metric": ..., "value": GB/s, "unit": "GB/s", "vs_baseline": ours/reference}

Field: Nyx-like 256^3 float32 (multiscale smooth + turbulence), ABS eb 1e-3,
default algorithm (INTERP_LORENZO tuner). Reference baseline = szcompressor/
SZ3 binary's self-reported compress+decompress seconds on the same data (built
on this host; skipped -> vs_baseline null). Supplementary numbers (device
compute, sizes) go to stderr.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent))

SIZE = int(os.environ.get("SZT_BENCH_SIZE", "256"))
EB = 1e-3
REPS = int(os.environ.get("SZT_BENCH_REPS", "5"))
REF_BIN = os.environ.get("SZT_REF_SZ3", "/tmp/ref-build/tools/sz3/sz3")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def nyx_like(n: int) -> np.ndarray:
    """Synthetic baryon-density-like field: multiscale waves + mild turbulence."""
    rng = np.random.default_rng(42)
    ax = np.linspace(0, 1, n, dtype=np.float64)
    X, Y, Z = np.meshgrid(ax, ax, ax, indexing="ij")
    f = (np.sin(4 * np.pi * X) * np.cos(6 * np.pi * Y) * np.sin(2 * np.pi * Z)
         + 0.5 * np.sin(16 * np.pi * (X + Y)) + 0.25 * np.cos(32 * np.pi * (Y - Z)))
    f += 0.05 * np.cumsum(rng.standard_normal((n, n, n)), axis=2) / np.sqrt(n)
    return np.ascontiguousarray(np.exp(f), dtype=np.float32)


def ensure_reference() -> bool:
    """Build the reference sz3 binary on demand (for vs_baseline)."""
    if Path(REF_BIN).exists():
        return True
    src = Path("/root/reference")
    if not src.exists():
        return False
    build_dir = Path(REF_BIN).parents[2]
    log(f"building reference sz3 at {build_dir} ...")
    try:
        subprocess.run(["cmake", "-S", str(src), "-B", str(build_dir),
                        "-DCMAKE_BUILD_TYPE=Release", "-DBUILD_TESTING=OFF", "-G", "Ninja"],
                       check=True, capture_output=True, timeout=300)
        subprocess.run(["ninja", "-C", str(build_dir), "sz3"],
                       check=True, capture_output=True, timeout=600)
    except Exception as e:
        log("reference build failed:", e)
        return False
    return Path(REF_BIN).exists()


def bench_host(data: np.ndarray):
    """Measure ours and the reference INTERLEAVED per repetition so shared-host
    load skews both sides equally (run-to-run variance here is +/-40%).
    Returns ((our_enc, our_dec, our_size), (ref_enc, ref_dec, ref_size)|None)
    with min-of-REPS per stage."""
    import sz3_tpu as szt

    have_ref = ensure_reference()
    if not have_ref:
        log(f"reference binary not found at {REF_BIN}; vs_baseline = null")
    dat, szf, outf = "/tmp/szt_bench.dat", "/tmp/szt_bench.sz", "/tmp/szt_bench.out"
    dims = [str(s) for s in reversed(data.shape)]
    if have_ref:
        data.tofile(dat)

    # warm both paths
    blob = szt.compress(data, szt.Config(dims=data.shape, absErrorBound=EB))
    szt.decompress(blob)

    ours_e, ours_d, ref_e, ref_d = [], [], [], []
    ref_size = None
    for _ in range(REPS):
        t = time.time()
        blob = szt.compress(data, szt.Config(dims=data.shape, absErrorBound=EB))
        ours_e.append(time.time() - t)
        if have_ref:
            r = subprocess.run([REF_BIN, "-f", "-i", dat, "-z", szf, "-3", *dims,
                                "-M", "ABS", str(EB)], capture_output=True, text=True)
            ref_e.append(float(re.search(r"compression time = ([0-9.eE+-]+)", r.stdout).group(1)))
            ref_size = Path(szf).stat().st_size
        t = time.time()
        out, _ = szt.decompress(blob)
        ours_d.append(time.time() - t)
        if have_ref:
            r = subprocess.run([REF_BIN, "-f", "-z", szf, "-o", outf, "-3", *dims],
                               capture_output=True, text=True)
            ref_d.append(float(re.search(r"decompression time = ([0-9.eE+-]+)", r.stdout).group(1)))
    err = float(np.abs(out.astype(np.float64) - data.astype(np.float64)).max())
    assert err <= EB * 1.0000001, f"error bound violated: {err}"
    ours = (min(ours_e), min(ours_d), len(blob))
    ref = (min(ref_e), min(ref_d), ref_size) if have_ref else None
    return ours, ref


def probe_backend(timeout: int = 240):
    """Probe TPU backend init in a SUBPROCESS with a bounded timeout so a hung
    PJRT client creation (axon tunnel down: hangs >25 min, VERDICT r3) can
    never hang the bench itself. Returns (backend|None, status string)."""
    code = ("import jax,numpy as np,jax.numpy as jnp;"
            "x=jax.device_put(np.ones((8,128),np.float32));"
            "print('BACKEND',jax.default_backend(),float(jnp.sum(x)))")
    try:
        r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                           text=True, timeout=timeout, env=_DEVICE_ENV)
    except subprocess.TimeoutExpired:
        return None, f"probe timeout >{timeout}s (tunnel hang in PJRT init)"
    except Exception as e:  # pragma: no cover
        return None, f"probe failed to launch: {e}"
    if r.returncode == 0 and "BACKEND" in r.stdout:
        backend = r.stdout.split("BACKEND", 1)[1].split()[0]
        return backend, f"ok:{backend}"
    err = (r.stderr or "").strip().splitlines()
    return None, "probe init failed: " + (err[-1][:300] if err else f"rc={r.returncode}")


# Environment for device subprocesses: the ORIGINAL env (before the parent
# pins itself to CPU) so the TPU plugin resolves normally there.
_DEVICE_ENV = dict(os.environ)


def run_device_benches(budget: int):
    """Run every device bench in ONE subprocess (`bench.py --device`) with a
    hard timeout. The parent process NEVER initializes the TPU backend, so a
    tunnel death mid-bench can only lose device numbers, never the metric.
    Returns a device_status string; per-stage results stream to stderr and
    arrive as JSON lines on the child's stdout."""
    results = {}
    try:
        r = subprocess.run([sys.executable, __file__, "--device"],
                           capture_output=True, text=True, timeout=budget,
                           env=_DEVICE_ENV)
        out, errtxt, status = r.stdout, r.stderr, ("ok" if r.returncode == 0
                                                   else f"device bench rc={r.returncode}")
    except subprocess.TimeoutExpired as e:
        out = (e.stdout or b"").decode() if isinstance(e.stdout, bytes) else (e.stdout or "")
        errtxt = (e.stderr or b"").decode() if isinstance(e.stderr, bytes) else (e.stderr or "")
        status = f"device bench timeout >{budget}s (partial results kept)"
    if errtxt:
        sys.stderr.write(errtxt)
        sys.stderr.flush()
    for line in out.splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                results.update(json.loads(line))
            except Exception:
                pass
    return status, results


def device_main():
    """Child entry (`bench.py --device`): all TPU benches. Each stage emits a
    JSON line on stdout as it completes so a later hang loses nothing."""
    data = nyx_like(SIZE)
    nbytes = data.nbytes

    def emit(**kw):
        print(json.dumps(kw), flush=True)

    try:
        dev = bench_device(data)
        if dev is not None:
            denc, ddec = dev
            log(f"TPU device pipeline (amortized over 10 chained iters, "
                f"exact-f64 parity mode): "
                f"encode {denc*1e3:.2f} ms -> {nbytes/denc/1e9:.2f} GB/s/chip, "
                f"decode {ddec*1e3:.2f} ms -> {nbytes/ddec/1e9:.2f} GB/s/chip")
            emit(pipeline_enc_gbs=round(nbytes / denc / 1e9, 2),
                 pipeline_dec_gbs=round(nbytes / ddec / 1e9, 2))
    except Exception as e:
        log("device pipeline bench failed:", e)
    for fn in (bench_device_entropy, bench_device_decode, bench_wavefront_decode,
               bench_wavefront_encode, bench_f64_device, bench_serving):
        try:
            res = fn(data, nbytes)
            if res:
                emit(**res)
        except Exception as e:  # each fn also guards internally
            log(f"{fn.__name__} failed:", e)
    return 0


def bench_device(data: np.ndarray):
    """Pure device-compute throughput of the quantization pipeline (the part
    that runs on the TPU; entropy/IO stages are host-side). K iterations are
    chained inside one jit program so per-call tunnel/RPC latency (~30 ms on
    remote-attached chips) amortizes away — this measures the chip, not the
    link."""
    try:
        import jax
        import jax.numpy as jnp
        from sz3_tpu.ops.interp_fast import build_fast_plan, encode_grid_fast
    except Exception as e:  # pragma: no cover
        log("device bench skipped:", e)
        return None
    plan = build_fast_plan(data.shape, interp_algo=1, direction=0, anchor_stride=32,
                           alpha=1.25, beta=2.0, eb=EB, quantbin_cnt=65536)
    K = 10

    @jax.jit
    def run_k(x):
        def body(i, acc):
            # acc-dependent salt keeps iterations sequential (no CSE/overlap)
            bins, b0, recon = encode_grid_fast(x + acc * 1e-20, plan)
            s = sum(jnp.sum(b.astype(jnp.int32)) for b in bins).astype(jnp.float32)
            return acc + s + jnp.sum(recon)
        return jax.lax.fori_loop(0, K, body, jnp.float32(0))

    xj = jax.device_put(jnp.asarray(data))
    float(np.asarray(run_k(xj)))  # compile+warm
    ts = []
    for _ in range(REPS):
        t = time.time()
        float(np.asarray(run_k(xj)))
        ts.append(time.time() - t)
    enc_t = min(ts) / K

    # fast mode (float-float f64): same pipeline, parity not guaranteed on TPU
    prev_exact = os.environ.get("SZT_EXACT_F64")
    os.environ["SZT_EXACT_F64"] = "0"
    try:
        @jax.jit
        def run_k_fast(x):
            def body(i, acc):
                bins, b0, recon = encode_grid_fast(x + acc * 1e-20, plan)
                s = sum(jnp.sum(b.astype(jnp.int32)) for b in bins).astype(jnp.float32)
                return acc + s + jnp.sum(recon)
            return jax.lax.fori_loop(0, K, body, jnp.float32(0))

        float(np.asarray(run_k_fast(xj)))
        ts = []
        for _ in range(REPS):
            t = time.time()
            float(np.asarray(run_k_fast(xj)))
            ts.append(time.time() - t)
        enc_fast = min(ts) / K
        log(f"TPU device pipeline, fast mode (SZT_EXACT_F64=0): encode "
            f"{enc_fast*1e3:.2f} ms -> {data.nbytes/enc_fast/1e9:.2f} GB/s/chip")
    finally:
        if prev_exact is None:
            os.environ.pop("SZT_EXACT_F64", None)
        else:
            os.environ["SZT_EXACT_F64"] = prev_exact

    # decode side: real bins from the encode, zero literal slices
    from sz3_tpu.ops.interp_fast import decode_grid_fast

    @jax.jit
    def enc_once(x):
        bins, b0, recon = encode_grid_fast(x, plan)
        return bins

    bins_list = [jnp.asarray(b) for b in enc_once(xj)]
    lit_list = [jnp.zeros(b.shape, jnp.float32) for b in bins_list]
    lit0 = jnp.asarray(np.ascontiguousarray(
        data[tuple(slice(None, None, s) for s in plan.init_steps)]))

    @jax.jit
    def dec_k(bins, lits, l0):
        def body(i, acc):
            out = decode_grid_fast(bins, lits, plan, l0 + acc * 1e-20, jnp.int32(0), jnp.float32)
            return acc + jnp.sum(out)
        return jax.lax.fori_loop(0, K, body, jnp.float32(0))

    float(np.asarray(dec_k(bins_list, lit_list, lit0)))
    ts = []
    for _ in range(REPS):
        t = time.time()
        float(np.asarray(dec_k(bins_list, lit_list, lit0)))
        ts.append(time.time() - t)
    return enc_t, min(ts) / K


def main():
    # The parent process pins itself to the CPU backend AFTER snapshotting the
    # device env (_DEVICE_ENV at import time): host benches never touch the
    # TPU plugin, so a dead tunnel cannot hang or crash the metric path.
    # NOTE: the axon plugin's register() sets jax_platforms="axon,cpu" via
    # jax.config at interpreter startup, which overrides the env var — the
    # config update below is the one that actually sticks.
    os.environ["JAX_PLATFORMS"] = "cpu"
    try:
        import jax
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass
    gbs = vs = None
    device_status = "not probed"
    device_results = {}
    err_note = None
    try:
        data = nyx_like(SIZE)
        nbytes = data.nbytes
        log(f"field: {data.shape} f32 ({nbytes/1e6:.0f} MB), ABS eb={EB}")

        try:
            ours, ref = bench_host(data)
            enc, dec, size = ours
            gbs = 2 * nbytes / (enc + dec) / 1e9
            log(f"sz3-tpu native: enc {enc:.2f}s dec {dec:.2f}s size {size} "
                f"(ratio {nbytes/size:.2f}) -> {gbs:.3f} GB/s")
            if ref:
                renc, rdec, rsize = ref
                rgbs = 2 * nbytes / (renc + rdec) / 1e9
                vs = gbs / rgbs
                log(f"reference sz3: enc {renc:.2f}s dec {rdec:.2f}s size {rsize} -> {rgbs:.3f} GB/s")
                log(f"size parity: ours {size} vs ref {rsize} ({'EQUAL' if size == rsize else 'DIFFERENT'})")
        except Exception as e:
            err_note = f"host bench failed: {e}"
            log(err_note)

        # parallel-vs-parallel supplement: our chunked mode vs reference OpenMP
        nthreads = os.cpu_count() or 1
        if nthreads <= 1:
            log("chunked bench skipped: single-CPU host")
        else:
            bench_chunked(data, nthreads, nbytes)

        # Device benches: probe first (bounded subprocess), then run them all
        # in one killable subprocess. A tunnel hang costs device numbers only.
        if os.environ.get("SZT_BENCH_NO_DEVICE") == "1":
            device_status = "disabled (SZT_BENCH_NO_DEVICE=1)"
        else:
            backend, device_status = probe_backend(
                timeout=int(os.environ.get("SZT_BENCH_PROBE_TIMEOUT", "240")))
            log(f"device probe: {device_status}")
            if backend == "tpu":
                budget = int(os.environ.get("SZT_BENCH_DEVICE_BUDGET", "2400"))
                device_status, device_results = run_device_benches(budget)
            elif backend is not None:
                device_status = f"no TPU (backend={backend}); device benches skipped"
    except Exception as e:  # belt and braces: the metric line must print
        err_note = f"bench crashed: {e}"
        log(err_note)
    finally:
        out = {
            "metric": f"encode+decode GB/s ({SIZE}^3 f32, ABS {EB}, default algo)",
            "value": round(gbs, 4) if gbs else None,
            "unit": "GB/s",
            "vs_baseline": round(vs, 3) if vs else None,
            "device_status": device_status,
        }
        if device_results:
            out["device"] = device_results
        if err_note:
            out["error"] = err_note
        print(json.dumps(out), flush=True)


def bench_device_entropy(data, nbytes):
    """Device-resident entropy stage: array -> archive payload with the
    Huffman bit-pack on the TPU (algos/device_encode). Reports the honest
    wall time AND the device-compute time, because on remote-attached chips
    (axon tunnel) device->host readback runs at ~0.02 GB/s and dominates the
    wall clock; a locally attached chip pays ~1 ms of PCIe instead."""
    try:
        import jax
        import jax.numpy as jnp
        if jax.default_backend() != "tpu":
            log("device-entropy bench skipped: no TPU backend")
            return
        import sz3_tpu as szt
        from sz3_tpu.algos import device_encode
        from sz3_tpu.config import ALGO, Config

        def mkconf():
            c = Config(dims=data.shape, cmprAlgo=ALGO.INTERP,
                       absErrorBound=EB)
            c.interpAnchorStride = 32
            return c

        cap = 2 * nbytes + 4096
        payload = device_encode.encode_payload_device(mkconf(), data, cap)
        xd = jnp.asarray(data)
        walls = []
        for _ in range(REPS):
            t = time.time()
            device_encode.encode_payload_device(mkconf(), xd, cap)
            walls.append(time.time() - t)
        wall = min(walls)
        # compute isolation: time jit A and jit B with block_until_ready on
        # the DEVICE outputs (no payload readback; each timing includes one
        # ~26 ms RPC sync on the tunnel, so this upper-bounds device compute)
        c = mkconf()
        from sz3_tpu.ops.interp_fast import _maybe_on, exec_device
        plan, lp, jits = device_encode._static(
            tuple(c.dims), int(c.interpAlgo), c.interpDirection,
            c.interpAnchorStride, c.interpAlpha, c.interpBeta,
            c.absErrorBound, c.quantbinCnt, "float32")
        jit_a, jit_b, nc, mp, cap_rows, gmap_dev = jits
        num = int(np.prod(data.shape))
        with _maybe_on(exec_device()):
            outs_a = jit_a(xd, gmap_dev)
            jax.block_until_ready(outs_a)
            bins_stream, hist, lits, nlit = outs_a
            tree, total_bits, n_lit, tc, tl, c0 = device_encode._tree_and_tables(
                hist, nlit, cap_rows, c.quantbinCnt, num)
            tc_d, tl_d, c0_d = (jnp.asarray(tc), jnp.asarray(tl),
                                jnp.asarray(c0))
            jax.block_until_ready(jit_b(bins_stream, tc_d, tl_d, c0_d))
            ta, tb = [], []
            for _ in range(REPS):
                t = time.time()
                jax.block_until_ready(jit_a(xd, gmap_dev))
                ta.append(time.time() - t)
                t = time.time()
                jax.block_until_ready(jit_b(bins_stream, tc_d, tl_d, c0_d))
                tb.append(time.time() - t)
        t_a, t_b = min(ta), min(tb)
        log(f"  entropy encode compute isolation: jit A {t_a*1e3:.1f} ms + "
            f"jit B {t_b*1e3:.1f} ms = {(t_a+t_b)*1e3:.1f} ms -> "
            f"{nbytes/(t_a+t_b)/1e9:.2f} GB/s/chip (incl. 2 RPC syncs)")
        # measure the D2H tunnel rate to decompose the wall time honestly
        probe = jnp.zeros((1 << 20,), jnp.int32) + 1
        import numpy as _np
        _np.asarray(probe)
        t = time.time()
        _np.asarray(probe + 1)
        d2h_gbs = 4e-3 / max(time.time() - t, 1e-9)
        readback = len(payload) / max(d2h_gbs, 1e-9) / 1e9
        compute = max(wall - readback, 1e-9)
        log(f"TPU device-entropy encode (array->archive payload, bins never "
            f"leave the chip): wall {wall*1e3:.0f} ms "
            f"({nbytes/wall/1e9:.2f} GB/s) of which ~{readback*1e3:.0f} ms is "
            f"payload readback at the measured {d2h_gbs:.3f} GB/s tunnel D2H "
            f"-> device compute ~{compute*1e3:.0f} ms "
            f"({nbytes/compute/1e9:.2f} GB/s/chip)")
        return {"entropy_enc_wall_gbs": round(nbytes / wall / 1e9, 3),
                "entropy_enc_compute_gbs": round(nbytes / compute / 1e9, 2),
                "entropy_enc_jit_gbs": round(nbytes / (t_a + t_b) / 1e9, 2),
                "d2h_gbs": round(d2h_gbs, 3)}
    except Exception as e:
        log("device-entropy bench skipped:", e)


def bench_device_decode(data, nbytes):
    """Device entropy DECODE: archive payload -> array with the Huffman
    bit-walk on-chip (algos/device_decode via speculative windows,
    ops/entropy_decode.py). Wall time + the host engine's decode for
    comparison (VERDICT r2 item 2)."""
    try:
        import jax
        if jax.default_backend() != "tpu":
            log("device-decode bench skipped: no TPU backend")
            return
        import os
        import sz3_tpu as szt
        from sz3_tpu.config import ALGO, Config

        conf = Config(dims=data.shape, cmprAlgo=ALGO.INTERP, absErrorBound=EB)
        conf.interpAnchorStride = 32
        blob = szt.compress(data, conf.copy(), backend="native")
        t = time.time()
        out_h, _ = szt.decompress(blob)
        host = time.time() - t
        prev = os.environ.get("SZT_DEVICE_ENTROPY")
        os.environ["SZT_DEVICE_ENTROPY"] = "1"
        try:
            szt.decompress(blob, backend="jax")  # warm/compile
            walls = []
            for _ in range(REPS):
                t = time.time()
                out_d, _ = szt.decompress(blob, backend="jax")
                walls.append(time.time() - t)
        finally:
            if prev is None:
                os.environ.pop("SZT_DEVICE_ENTROPY", None)
            else:
                os.environ["SZT_DEVICE_ENTROPY"] = prev
        assert out_d.tobytes() == out_h.tobytes(), "device decode mismatch"
        wall = min(walls)
        from sz3_tpu.ops import entropy_decode as ed
        if ed.last_stats:
            log(f"  decode_stream pass profile: {ed.last_stats['passes']} "
                f"passes over {ed.last_stats['nwin']} windows, walls "
                f"{ed.last_stats['pass_walls']}, redo counts "
                f"{ed.last_stats['redo_counts']}")
        # isolate the tunnel: the decoded array (nbytes) rides D2H once per
        # decode; on the remote-attached chip that link is ~0.03 GB/s and
        # dominates the wall. Compute = wall - output readback at the
        # measured link rate.
        import jax.numpy as jnp
        probe = jnp.zeros(nbytes // 4, jnp.float32) + 1
        probe.block_until_ready()
        t = time.time()
        np.asarray(probe)
        d2h = nbytes / (time.time() - t)
        comp = max(wall - nbytes / d2h, 1e-9)
        log(f"TPU device-entropy decode (archive->array, bit-walk on-chip): "
            f"wall {wall*1e3:.0f} ms ({nbytes/wall/1e9:.2f} GB/s) of which "
            f"~{nbytes/d2h*1e3:.0f} ms is output readback at "
            f"{d2h/1e9:.3f} GB/s D2H -> device compute ~{comp*1e3:.0f} ms "
            f"({nbytes/comp/1e9:.2f} GB/s/chip) vs host engine "
            f"{host*1e3:.0f} ms ({nbytes/host/1e9:.2f} GB/s)")
        return {"dev_decode_wall_gbs": round(nbytes / wall / 1e9, 3),
                "dev_decode_compute_gbs": round(nbytes / comp / 1e9, 3),
                "host_decode_gbs": round(nbytes / host / 1e9, 3)}
    except Exception as e:
        log("device-decode bench skipped:", e)


def bench_wavefront_decode(data, nbytes):
    """LORENZO_REG decode with the element sweep as the anti-diagonal
    wavefront scan (ops/blockwise_wavefront, the default device route for
    f32 3D). Reports the device scan time in isolation — K chained
    iterations inside one jit amortize per-call RPC latency — plus the
    end-to-end walls for both engines. On remote-attached chips the full
    decode wall is dominated by the ~0.02 GB/s tunnel D2H of the skewed
    slab (~3x the field for cubes); a locally attached chip pays PCIe."""
    try:
        import jax
        import jax.numpy as jnp
        import sz3_tpu as szt
        from sz3_tpu import runtime
        from sz3_tpu.config import ALGO, Config
        from sz3_tpu.ops import blockwise_wavefront as wf

        conf = Config(dims=data.shape, cmprAlgo=ALGO.LORENZO_REG,
                      absErrorBound=EB)
        blob = szt.compress(data, conf.copy(), backend="native")
        t = time.time()
        szt.decompress(blob)
        host_dec = time.time() - t
        szt.decompress(blob, backend="jax")   # compile/warm (one-time ~20-70s)
        t = time.time()
        szt.decompress(blob, backend="jax")
        wall = time.time() - t

        # isolate the device scan: K chained sweeps in one program
        from sz3_tpu.api import _HDR
        from sz3_tpu.config import Config as _Cfg
        _, _, psize = _HDR.unpack_from(blob, 0)
        work, _ = _Cfg.load(blob, 16 + psize)
        streams = runtime.blockwise_open(work, blob[16:16 + psize])
        run, S0, bins_s, lit_s, type_s, _ = wf.prepare_wavefront(
            work.dims, work.absErrorBound, work.quantbinCnt // 2,
            work.lorenzo, work.lorenzo2, work.regression, *streams)
        core = run.__wrapped__
        K = 5

        @jax.jit
        def run_k(S0, b, l, ty):
            def body(i, acc):
                S = core(S0 + acc * jnp.float32(1e-30), b, l, ty)
                return acc + S[wf.LEAD, 2, 2]
            return jax.lax.fori_loop(0, K, body, jnp.float32(0))

        args = [jax.device_put(jnp.asarray(a))
                for a in (S0, bins_s, lit_s, type_s)]
        float(np.asarray(run_k(*args)))  # compile+warm
        ts = []
        for _ in range(REPS):
            t = time.time()
            float(np.asarray(run_k(*args)))
            ts.append(time.time() - t)
        scan_t = min(ts) / K
        shp = "x".join(map(str, data.shape))
        log(f"TPU wavefront LORENZO_REG decode ({shp}): device scan "
            f"{scan_t*1e3:.1f} ms -> {nbytes/scan_t/1e9:.2f} GB/s/chip; "
            f"end-to-end wall {wall:.2f}s (host engine {host_dec:.2f}s)")
        return {"wavefront_scan_gbs": round(nbytes / scan_t / 1e9, 2),
                "wavefront_wall_s": round(wall, 2)}
    except Exception as e:
        log("wavefront decode bench skipped:", e)


def bench_wavefront_encode(data, nbytes):
    """Speculative wavefront LORENZO_REG ENCODE (round-4,
    ops/blockwise_wavefront_encode.py): device scan isolated via K chained
    iterations, plus the end-to-end walls for both engines and an archive
    parity assert. The fits/selection passes and the host chain are outside
    the scan timing (they are parallel/tiny; the scan is the format's
    sequential core)."""
    try:
        import jax
        import jax.numpy as jnp
        import sz3_tpu as szt
        from sz3_tpu.config import ALGO, Config
        from sz3_tpu.ops import blockwise_wavefront_encode as wfe

        conf = Config(dims=data.shape, cmprAlgo=ALGO.LORENZO_REG,
                      absErrorBound=EB)
        t = time.time()
        blob_n = szt.compress(data, conf.copy(), backend="native")
        host_enc = time.time() - t
        szt.compress(data, conf.copy(), backend="jax")  # compile/warm
        t = time.time()
        blob_d = szt.compress(data, conf.copy(), backend="jax")
        wall = time.time() - t
        assert blob_d == blob_n, "wavefront encode archive mismatch"

        # isolate the device scan: rebuild the certified inputs, then chain
        from sz3_tpu.ops.blockwise_device import BS
        from sz3_tpu.ops.blockwise_wavefront import LEAD, _skew_view
        nb = tuple(-(-d // BS) for d in data.shape)
        NX, NY, NZ = (nb[0] * BS, nb[1] * BS, nb[2] * BS)
        run = wfe._jit_wavefront_enc((NX, NY, NZ), EB,
                                     conf.quantbinCnt // 2)
        TOT = LEAD + NX + NY + NZ - 2
        G = np.zeros((NX, NY, NZ), np.float32)
        G[:data.shape[0], :data.shape[1], :data.shape[2]] = data
        S0 = np.zeros((TOT, NY + 2, NZ + 2), np.float32)
        orig_s = np.zeros((TOT - LEAD, NY, NZ), np.float32)
        _skew_view(orig_s, NX, NY, NZ)[:] = G
        type_s = np.zeros((TOT - LEAD, NY, NZ), np.uint8)  # all-L1 schedule
        K = 5
        core = run.__wrapped__

        @jax.jit
        def run_k(S0, os_, ts_):
            def body(i, acc):
                S, bins = core(S0 + acc * jnp.float32(1e-30), os_, ts_)
                return acc + S[LEAD, 2, 2] + bins[0, 0, 0].astype(jnp.float32)
            return jax.lax.fori_loop(0, K, body, jnp.float32(0))

        args = [jax.device_put(jnp.asarray(a)) for a in (S0, orig_s, type_s)]
        float(np.asarray(run_k(*args)))  # compile+warm
        ts = []
        for _ in range(REPS):
            t = time.time()
            float(np.asarray(run_k(*args)))
            ts.append(time.time() - t)
        scan_t = min(ts) / K
        shp = "x".join(map(str, data.shape))
        log(f"TPU wavefront LORENZO_REG encode ({shp}): device scan "
            f"{scan_t*1e3:.1f} ms -> {nbytes/scan_t/1e9:.2f} GB/s/chip; "
            f"end-to-end wall {wall:.2f}s (host engine {host_enc:.2f}s), "
            f"archives byte-identical")
        return {"wavefront_enc_scan_gbs": round(nbytes / scan_t / 1e9, 2),
                "wavefront_enc_wall_s": round(wall, 2)}
    except Exception as e:
        log("wavefront encode bench skipped:", e)


def bench_f64_device(data, nbytes):
    """f64 INTERP device-entropy encode (round-4 route: literals ride the
    kernel as lo/hi i32 half-streams). Field: the bench field widened to
    f64 (same values); archives asserted equal to the host engine's."""
    try:
        import jax
        if jax.default_backend() != "tpu":
            log("f64 device bench skipped: no TPU backend")
            return
        import sz3_tpu as szt
        from sz3_tpu.algos import device_encode
        from sz3_tpu.config import ALGO, Config

        d64 = data.astype(np.float64)
        conf = Config(dims=d64.shape, cmprAlgo=ALGO.INTERP, absErrorBound=EB)
        cap = 2 * d64.nbytes + 4096
        payload = device_encode.encode_payload_device(conf.copy(), d64, cap)
        from sz3_tpu import runtime
        host_payload = runtime.compress_payload(conf.copy(), d64, cap)
        assert payload == host_payload, "f64 device archive != host engine"
        walls = []
        for _ in range(max(2, REPS // 2)):
            t = time.time()
            device_encode.encode_payload_device(conf.copy(), d64, cap)
            walls.append(time.time() - t)
        wall = min(walls)
        log(f"TPU f64 device-entropy encode: wall {wall*1e3:.0f} ms "
            f"({d64.nbytes/wall/1e9:.2f} GB/s of f64 input; payload "
            f"{len(payload)} B)")
        return {"f64_entropy_enc_wall_gbs": round(d64.nbytes / wall / 1e9, 3)}
    except Exception as e:
        log("f64 device bench skipped:", e)


def bench_serving(data, nbytes):
    """Pipelined serving steady-state: a stream of same-shape fields through
    serving.compress_batch with the device-entropy route, host tree/zstd
    overlapped with device compute (serving._compress_batch_device_entropy).
    Steady-state = second batch (first pays compiles), reported as fields/s
    and GB/s/chip. Archives spot-checked against the host engine."""
    try:
        import jax
        if jax.default_backend() != "tpu":
            log("serving bench skipped: no TPU backend")
            return
        import os
        import sz3_tpu as szt
        from sz3_tpu import serving
        from sz3_tpu.config import ALGO, Config

        k = int(os.environ.get("SZT_BENCH_SERVE_FIELDS", "6"))
        rng = np.random.default_rng(7)
        stack = np.stack([data * (1.0 + 0.01 * i) + rng.standard_normal(data.shape).astype(np.float32) * 1e-4
                          for i in range(k)])
        conf = Config(dims=data.shape, cmprAlgo=ALGO.INTERP, absErrorBound=EB)
        conf.interpAnchorStride = 32
        prev = os.environ.get("SZT_DEVICE_ENTROPY")
        os.environ["SZT_DEVICE_ENTROPY"] = "1"
        try:
            blobs = serving.compress_batch(stack, conf.copy())  # warm/compile
            t = time.time()
            blobs = serving.compress_batch(stack, conf.copy())
            wall = time.time() - t
        finally:
            if prev is None:
                os.environ.pop("SZT_DEVICE_ENTROPY", None)
            else:
                os.environ["SZT_DEVICE_ENTROPY"] = prev
        host_blob = szt.compress(stack[0], conf.copy(), backend="native")
        assert blobs[0] == host_blob, "serving archive != host engine"
        gbs = k * nbytes / wall / 1e9
        log(f"TPU pipelined serving steady-state ({k} fields of "
            f"{'x'.join(map(str, data.shape))}): {wall:.2f}s total -> "
            f"{k/wall:.2f} fields/s, {gbs:.2f} GB/s/chip "
            f"(host tree+zstd overlapped with device compute)")
        return {"serving_gbs": round(gbs, 3),
                "serving_fields_per_s": round(k / wall, 2)}
    except Exception as e:
        log("serving bench skipped:", e)


def bench_chunked(data, nthreads, nbytes):
    try:
        import sz3_tpu as szt
        conf = szt.Config(dims=data.shape, absErrorBound=EB, openmp=True)
        szt.compress(data, conf, nthreads=nthreads)  # warm
        t = time.time()
        blob_p = szt.compress(data, szt.Config(dims=data.shape, absErrorBound=EB, openmp=True),
                              nthreads=nthreads)
        enc_p = time.time() - t
        t = time.time()
        out_p, _ = szt.decompress(blob_p)
        dec_p = time.time() - t
        log(f"sz3-tpu chunked x{nthreads}: enc {enc_p:.2f}s dec {dec_p:.2f}s "
            f"-> {2*nbytes/(enc_p+dec_p)/1e9:.3f} GB/s")
    except Exception as e:
        log("chunked bench skipped:", e)


if __name__ == "__main__":
    if "--device" in sys.argv[1:]:
        sys.exit(device_main())
    main()
