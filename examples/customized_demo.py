"""The four extension patterns, mirroring the reference's customized demo
(tools/sz3/sz3_customized_demo.cpp:1-15,135-168):

  1. use the high-level API with a tuned Config;
  2. assemble a pipeline from existing modules (quantize -> entropy -> zstd);
  3. plug a custom decomposition (predictor) into the generic pipeline;
  4. build a fully custom compressor on the primitive layers.

Run: python examples/customized_demo.py
"""

import numpy as np

import sz3_tpu as szt
from sz3_tpu import runtime
from sz3_tpu.config import ALGO, Config, INTERP_ALGO


def make_data(shape=(64, 64, 64)):
    g = np.meshgrid(*[np.linspace(0, 1, s) for s in shape], indexing="ij")
    return (np.sin(6 * g[0]) + np.cos(9 * g[1]) * g[2]).astype(np.float32)


def pattern1_highlevel_api():
    """Reference pattern 1: SZ_compress with a configured Config."""
    data = make_data()
    conf = Config(dims=data.shape, cmprAlgo=ALGO.INTERP, interpAlgo=INTERP_ALGO.LINEAR,
                  absErrorBound=1e-3)
    blob = szt.compress(data, conf)
    out, used = szt.decompress(blob)
    assert np.abs(out - data).max() <= 1e-3
    print(f"1. high-level API: ratio {data.nbytes / len(blob):.1f}")


def pattern2_assemble_modules():
    """Reference pattern 2: compose quantizer + encoder + lossless yourself.
    Here: device-vectorized quantization against a zero prediction, the
    stock Huffman coder, and the zstd backend — a from-parts NOPRED."""
    import jax.numpy as jnp
    from sz3_tpu.ops.quantize import quantize, recover

    data = make_data()
    bins, recon = quantize(jnp.asarray(data), jnp.zeros_like(data), 1e-3, 32768)
    bins = np.asarray(bins)
    payload = runtime.zstd_compress(runtime.huff_encode(bins.ravel()))

    decoded_bins = runtime.huff_decode(runtime.zstd_decompress(payload), data.size)
    out = np.asarray(recover(jnp.zeros_like(data), jnp.asarray(decoded_bins.reshape(data.shape)),
                             jnp.asarray(data), 1e-3, 32768))
    assert np.abs(out[bins.reshape(data.shape) != 0] -
                  data[bins.reshape(data.shape) != 0]).max() <= 1e-3
    print(f"2. assembled modules: payload {len(payload)} bytes")


def pattern3_custom_decomposition():
    """Reference pattern 3: your own predictor feeding the standard
    quantize/encode/lossless tail. Example: mean-of-causal-neighbors."""
    import jax.numpy as jnp
    from sz3_tpu.ops.quantize import quantize

    data = make_data()
    x = jnp.asarray(data)
    pred = (jnp.pad(x, ((1, 0), (0, 0), (0, 0)))[:-1] +
            jnp.pad(x, ((0, 0), (1, 0), (0, 0)))[:, :-1]) * 0.5  # causal, toy
    bins, recon = quantize(x, pred.astype(x.dtype), 1e-3, 32768)
    payload = runtime.zstd_compress(runtime.huff_encode(np.asarray(bins).ravel()))
    print(f"3. custom decomposition: ratio {data.nbytes / len(payload):.1f} "
          f"(toy predictor, no reconstruction feedback)")


def pattern4_custom_compressor():
    """Reference pattern 4: a fully custom compressor — here byte truncation
    (the SZTruncateCompressor specialization) from the encoders toolbox."""
    from sz3_tpu.encoders import truncate_compress, truncate_decompress

    data = make_data()
    blob = truncate_compress(data, byte_len=2)
    out = truncate_decompress(blob, data.size, byte_len=2).reshape(data.shape)
    rel = np.abs((out - data) / np.maximum(np.abs(data), 1e-9)).max()
    print(f"4. custom compressor (truncate): ratio {data.nbytes / len(blob):.1f}, "
          f"max rel err {rel:.1e}")


if __name__ == "__main__":
    pattern1_highlevel_api()
    pattern2_assemble_modules()
    pattern3_custom_decomposition()
    pattern4_custom_compressor()
