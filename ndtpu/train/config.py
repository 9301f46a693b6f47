"""One dataclass config with the reference's flag names and defaults
(tools/train.py:99-112, train_pointnet.py:16-27, train_multiscale.py:17-29),
plus TPU-specific knobs the reference lacks (mesh, dtype, resume)."""
from __future__ import annotations

import dataclasses
from typing import Optional


@dataclasses.dataclass
class TrainConfig:
    # reference flags (tools/train.py:99-112)
    task: str = "segmentation"
    n_desired_nds: int = 2080
    n_samples: int = 70000
    train_path: Optional[str] = None
    val_path: Optional[str] = None
    test_path: Optional[str] = None
    out_path: str = "out"
    epochs: int = 200
    save_every: int = 2
    batch_size: int = 16
    learning_rate: float = 0.034
    n_classes: int = 28
    feature_dim: int = 768

    # multiscale flags (tools/train_multiscale.py:17-29)
    n_desired_nds1: int = 4080

    # LR schedule: the *intended* semantics of train.py:53-57
    # (halve every 20 epochs; the reference's `epoch+1 % 20` precedence bug
    # is documented in SURVEY.md §2.4 and not replicated)
    lr_decay_epochs: int = 20
    lr_decay_rate: float = 0.5

    # TPU-native additions
    resume: Optional[str] = None          # checkpoint dir to resume from
    wandb: bool = False                   # optional, host-0 only
    wandb_project: str = "ndnet"
    param_dtype: str = "float32"
    compute_dtype: str = "float32"  # set bfloat16 for MXU-native compute
    use_pallas: str = "auto"        # auto|on|off: Pallas segment-sum kernel
    # voxel-size search inside the jitted step: "probe" (the r5 default —
    # the fused secant search cold-seeded by a Chao1 subsample probe,
    # ~1 full payload sort per cold cloud; same acceptance band,
    # tests/test_ndt.py), "fast" (exact-seed fused search, ~2 cold
    # sorts — the r4 configuration), "reference" (the C core's <=15-sort
    # bisection, ndt.c:136-187) or "grid"
    search: str = "probe"
    # feed segmentation GT as [B, N] int32 class tags instead of the
    # reference's one-hot [B, N, C+1] (C+1x less host->device traffic;
    # bit-equivalent — argmax(one_hot(l)) == l, tests/test_golden.py).
    # --no-int_labels restores the literal reference contract.
    int_labels: bool = True
    # streaming regime (segmentation): search each sample's voxel size
    # ONCE up front, then train/eval with fixed sizes — one voxelization
    # per cloud per step instead of the full search (the production
    # frame-stream configuration; bench.py --streaming measures it)
    streaming: bool = False
    data_axis: str = "data"
    seed: int = 0
    # length of the synthetic fallback datasets (when no --train_path):
    # clouds per split — sets steps/epoch for trainer-throughput sessions
    synthetic_length: int = 32
    # cache dataset samples in host RAM after first fetch (see
    # ndtpu.data.loader.CachedDataset; the r4 TPU session measured epochs
    # host-bound on per-epoch sample regeneration). --no-cache_dataset
    # for datasets larger than RAM.
    cache_dataset: bool = True
    # hold the WHOLE dataset in device HBM and gather batches on device
    # (ndtpu.data.loader.DeviceCachedDataset): removes the per-step
    # host->device copy entirely — decisive on this image's ~10 MB/s
    # tunneled link, still a per-step copy saved on real hosts.
    # Single-process trainers with HBM-sized datasets only.
    device_cache: bool = False
    # with --device_cache: compile each epoch as ONE lax.scan program
    # (train.loop.make_epoch_scan) — one dispatch per epoch instead of
    # one per step (~25 ms/step saved on this image's tunneled link)
    epoch_scan: bool = True
    steps_per_epoch: Optional[int] = None  # derived from dataset when None

    # multi-host (jax.distributed.initialize; SURVEY.md §2.3 DP row).
    # Leave num_processes at 1 for single-host; on each host pass
    # --coordinator host0:port --num_processes P --process_id i.
    coordinator: Optional[str] = None
    num_processes: int = 1
    process_id: int = 0

    def validate(self):
        if self.search not in ("fast", "probe", "reference", "grid"):
            raise ValueError(
                f"--search must be fast|probe|reference|grid, got {self.search!r}"
            )
        return self

    def resolve_use_pallas(self) -> bool:
        """auto -> the fused Pallas segment-sum on TPU, XLA path elsewhere."""
        if self.use_pallas not in ("auto", "on", "off"):
            raise ValueError(
                f"--use_pallas must be auto|on|off, got {self.use_pallas!r}"
            )
        if self.use_pallas == "auto":
            from ndtpu.utils.platform import is_tpu

            return is_tpu()
        return self.use_pallas == "on"

    @classmethod
    def from_args(cls, argv=None, **default_overrides):
        """argparse overlay with the reference's flag names;
        `default_overrides` replace the dataclass defaults (e.g. the
        pointnet trainer's n_samples=4160, train_pointnet.py:16-27) but
        stay overridable on the command line."""
        import argparse
        import typing

        # resolve the real annotation types (fields carry strings under
        # `from __future__ import annotations`); Optional[T] unwraps to T
        hints = typing.get_type_hints(cls)

        def base_type(t):
            args = [a for a in typing.get_args(t) if a is not type(None)]
            return args[0] if args else t

        parser = argparse.ArgumentParser()
        for f in dataclasses.fields(cls):
            default = default_overrides.get(f.name, f.default)
            t = base_type(hints[f.name])
            if t is bool:
                # --flag / --no-flag, so a default override of True can
                # still be disabled on the command line
                parser.add_argument(
                    f"--{f.name}", action=argparse.BooleanOptionalAction,
                    default=default,
                )
            elif t in (int, float, str):
                parser.add_argument(f"--{f.name}", type=t, default=default)
            else:
                parser.add_argument(f"--{f.name}", type=str, default=default)
        ns = parser.parse_args(argv)
        return cls(**vars(ns)).validate()
