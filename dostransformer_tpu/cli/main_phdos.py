"""phDOS training driver (counterpart of reference main_phDOS.py).

Dataset resolution:
  * --synthetic N : synthetic phonon-style samples, split 80/10/10;
  * default       : {data_dir}/data.csv featurized on the fly
                    (dostransformer_tpu.data.featurize_phdos — numpy periodic
                    neighbor search, r_max=4.0 per reference main_phDOS.py:21)
                    with splits read from {data_dir}/idx_{train,valid,test}.txt
                    (main_phDOS.py:47-49); if the txt files are absent, the
                    element-balanced splitter generates them (the reference's
                    utils.py:176-245 is offline tooling for exactly this).

The reference trains phDOS in float64 at batch_size=1 (main_phDOS.py:14-16,52).
TPUs have no native f64: this driver defaults to f32 (SURVEY.md §7.3-2) and
batch_size is a real flag (default 1 for parity).
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
from dostransformer_tpu.data.datasets import edos_random_split, read_index_file
from dostransformer_tpu.data.synthetic import synthetic_phdos_samples


def main(argv=None):
    args = build_arg_parser("phdos").parse_args(argv)
    cfg = config_from_args(args)
    # before any other JAX call
    maybe_init_multihost(args.data_parallel or args.tensor_parallel > 1)
    print(f"device: {resolve_device_info()}")

    if args.synthetic:
        if args.synthetic_learnable:
            from dostransformer_tpu.data.synthetic import (
                synthetic_phdos_learnable,
            )

            samples = synthetic_phdos_learnable(args.synthetic,
                                                seed=cfg.random_state)
        else:
            samples = synthetic_phdos_samples(args.synthetic,
                                              seed=cfg.random_state)
        train, valid, test = edos_random_split(samples, cfg.random_state)
    else:
        csv = os.path.join(args.data_dir, "data.csv")
        if not os.path.exists(csv):
            sys.exit(f"dataset not found: {csv} — use --synthetic N or place "
                     "the phononDoS data.csv there")
        from dostransformer_tpu.data.featurize_phdos import featurize_csv

        samples, species = featurize_csv(csv, r_max=4.0)
        idx_files = [os.path.join(args.data_dir, f"idx_{s}.txt")
                     for s in ("train", "valid", "test")]
        if all(os.path.exists(p) for p in idx_files):
            idx_tr, idx_va, idx_te = map(read_index_file, idx_files)
        else:
            from dostransformer_tpu.data.datasets import element_balanced_split

            idx_tr, idx_va, idx_te = element_balanced_split(
                species, valid_size=0.1, test_size=0.1, seed=12)
            for p, idx in zip(idx_files, (idx_tr, idx_va, idx_te)):
                with open(p, "w") as f:
                    f.write("\n".join(map(str, idx)))
        train = [samples[i] for i in idx_tr]
        valid = [samples[i] for i in idx_va]
        test = [samples[i] for i in idx_te]
        if not valid or not test:
            # the element-balanced splitter can leave tiny datasets with an
            # empty dev split; fall back to a random 80/10/10
            print("element-balanced split produced an empty dev set; "
                  "falling back to a random 80/10/10 split")
            train, valid, test = edos_random_split(samples, cfg.random_state)

    print(f"train/valid/test: {len(train)}/{len(valid)}/{len(test)}")
    result = run_training("phdos", cfg, train, valid, test,
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
