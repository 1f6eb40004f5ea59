from scaling_retriever_tpu.serving.server import (  # noqa: F401
    DenseTileBackend, RetrievalServer, SparseTileBackend, serve_http,
)
