"""eDOS training driver (counterpart of reference main_eDOS.py).

Dataset resolution:
  * --synthetic N         : N structurally faithful synthetic samples;
  * --dataset whole       : {data_dir}/dos_dataset_random.npz, split 80/10/10
                            with sklearn train_test_split(random_state)
                            (reference main_eDOS.py:42-48);
  * --dataset ood_crystal / ood_element :
                            {data_dir}/train_{d}.npz + {data_dir}/test_{d}.npz;
                            valid/test = halves of the OOD test set
                            (main_eDOS.py:34-39).
npz files are produced by dostransformer_tpu.data.featurize_edos (offline).
"""

from __future__ import annotations

import os
import sys

from dostransformer_tpu.cli.common import (
    build_arg_parser,
    config_from_args,
    maybe_init_multihost,
    resolve_device_info,
    run_training,
)
from dostransformer_tpu.data.datasets import edos_ood_split, edos_random_split
from dostransformer_tpu.data.io import load_samples
from dostransformer_tpu.data.synthetic import synthetic_edos_samples


def main(argv=None):
    args = build_arg_parser("edos").parse_args(argv)
    cfg = config_from_args(args)
    # before any other JAX call
    maybe_init_multihost(args.data_parallel or args.tensor_parallel > 1)
    print(f"device: {resolve_device_info()}")

    if args.synthetic:
        if args.synthetic_learnable:
            from dostransformer_tpu.data.synthetic import (
                synthetic_edos_learnable,
            )

            samples = synthetic_edos_learnable(args.synthetic,
                                               seed=cfg.random_state)
        else:
            samples = synthetic_edos_samples(args.synthetic,
                                             seed=cfg.random_state)
        train, valid, test = edos_random_split(samples, cfg.random_state)
    elif cfg.dataset == "whole":
        path = os.path.join(args.data_dir, "dos_dataset_random.npz")
        if not os.path.exists(path):
            sys.exit(f"dataset not found: {path} — featurize with "
                     "`python -m dostransformer_tpu.data.featurize_edos` or "
                     "use --synthetic N")
        train, valid, test = edos_random_split(load_samples(path),
                                               cfg.random_state)
    else:
        d = cfg.dataset.replace("ood_", "")
        tr = load_samples(os.path.join(args.data_dir, f"train_ood_{d}.npz"))
        te = load_samples(os.path.join(args.data_dir, f"test_ood_{d}.npz"))
        train, valid, test = edos_ood_split(tr, te, cfg.random_state)

    print(f"train/valid/test: {len(train)}/{len(valid)}/{len(test)}")
    result = run_training("edos", cfg, train, valid, test,
                          use_pallas=args.use_pallas,
                          data_parallel=args.data_parallel,
                          tensor_parallel=args.tensor_parallel,
                          results_dir=args.results_dir,
                          export_preds=args.export_preds,
                          profile_dir=args.profile_dir,
                          debug_nans=args.debug_nans,
                          x64=args.x64,
                          remat=args.remat,
                          host_loader=args.host_loader,
                          compile_cache=args.compile_cache,
                          tensorboard=args.tensorboard,
                          pad_bins=args.pad_bins,
                          bf16_data=args.bf16_data,
                          bucketed=args.bucketed,
                          init_torch=args.init_torch,
                          grad_clip=args.grad_clip,
                          warmup_epochs=args.warmup_epochs,
                          cosine_lr=args.cosine_lr)
    print(f"\nbest epoch {result['best_epoch']} | test {result['test']} | "
          f"{result['samples_per_sec']:.1f} samples/sec")
    return result


if __name__ == "__main__":
    main()
