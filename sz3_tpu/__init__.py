"""sz3-tpu: TPU-native error-bounded lossy compressor, SZ3 archive compatible.

Public API (mirrors the reference templated API, reference api/sz.hpp:43,117):

    import sz3_tpu as szt
    conf = szt.Config(dims=(100, 200, 300), errorBoundMode=szt.EB.ABS, absErrorBound=1e-3)
    blob = szt.compress(data, conf)          # -> bytes (SZ3 container)
    out, conf2 = szt.decompress(blob)        # -> np.ndarray, Config
"""

import os as _os

# Persistent XLA compilation cache: the wavefront/entropy device programs
# compile in 20-70 s; caching them on disk makes every process after the
# first pay ~0 (key = HLO + compiler version + chip, so stale entries can't
# be loaded). Opt out with SZT_COMP_CACHE=0 or point elsewhere via
# SZT_COMP_CACHE_DIR. Set lazily-safe: config flags only, no backend init.
if _os.environ.get("SZT_COMP_CACHE", "1") != "0":
    try:
        import jax as _jax

        _jax.config.update(
            "jax_compilation_cache_dir",
            _os.environ.get("SZT_COMP_CACHE_DIR",
                            _os.path.expanduser("~/.cache/sz3_tpu/xla")))
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        _jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass

from .config import Config, EB, ALGO, INTERP_ALGO, DataType
from .api import compress, decompress, compress_size_bound
from .stats import verify

__version__ = "0.1.0"
# Version stamped into archives (must remain parseable by reference SZ3 builds
# of the same data version; reference version.hpp.in:10-27 + CMakeLists.txt:2,7).
SZ3_DATA_VER = (3, 3, 2)

__all__ = [
    "Config", "EB", "ALGO", "INTERP_ALGO", "DataType",
    "compress", "decompress", "compress_size_bound", "verify",
]
