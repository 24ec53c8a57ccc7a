"""Top-level `pysz` shim: the reference binding is imported as
`from pysz import sz, szConfig` (tools/pysz/README); this forwards to the
sz3_tpu implementation so existing scripts run unchanged."""

from sz3_tpu.pysz import sz, szAlgorithm, szConfig, szErrorBoundMode  # noqa: F401
