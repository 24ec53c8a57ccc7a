"""sz3-tpu: TPU-native error-bounded lossy compressor, SZ3 archive compatible.

Public API (mirrors the reference templated API, reference api/sz.hpp:43,117):

    import sz3_tpu as szt
    conf = szt.Config(dims=(100, 200, 300), errorBoundMode=szt.EB.ABS, absErrorBound=1e-3)
    blob = szt.compress(data, conf)          # -> bytes (SZ3 container)
    out, conf2 = szt.decompress(blob)        # -> np.ndarray, Config
"""

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
