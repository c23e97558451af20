from crdmodel_tpu.utils.profiling import (
    throughput, trace, device_sync, RunManifest,
)

__all__ = ["throughput", "trace", "device_sync", "RunManifest"]
