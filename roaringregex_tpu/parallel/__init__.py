from .dist import (  # noqa: F401
    DistScanner,
    make_mesh,
    shard_batch,
)
from .health import (  # noqa: F401
    ElasticScanner,
    InjectedFault,
    MeshHealth,
    inject_faults,
    probe_mesh,
    surviving_mesh,
    with_retry,
)
