from .dist import (  # noqa: F401
    DistScanner,
    make_mesh,
    shard_batch,
)
