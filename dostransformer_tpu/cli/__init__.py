"""Command-line training drivers.

TPU-native counterparts of the reference entry points (main_eDOS.py,
main_phDOS.py) with the same 13-flag surface (reference utils.py:25-43) plus
the TPU additions (mesh shape, checkpointing, JSONL logging, synthetic data).
"""

from dostransformer_tpu.cli.common import (  # noqa: F401
    build_arg_parser,
    run_training,
)
