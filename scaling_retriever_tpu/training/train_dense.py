"""Dense retriever training entry point (reference train_dense.py:75-196).

Same surface as train_sparse with dense pooling defaults: single "rank"
task (no FLOPS regularizer) and temperature ``--T`` (default 0.01).

  python -m scaling_retriever_tpu.training.train_dense ...
"""

from __future__ import annotations

from scaling_retriever_tpu.training.train_sparse import main as _main


def main(argv=None):
    return _main(argv, pooling="dense")


if __name__ == "__main__":
    main()
