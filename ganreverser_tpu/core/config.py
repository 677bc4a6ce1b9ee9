"""Typed configs replacing the reference's per-script ``lapp`` flag blocks.

One dataclass per entry point, same flags and defaults as the reference
(train.lua:15-49, train_r.lua:12-29, apply_r.lua:13-23, pretrain_g.lua:12-35,
pretrain_with_previous_net.lua:12-37, sample.lua:9-24). Configs serialize to
JSON and travel inside checkpoints, preserving the reference's
"config travels with the checkpoint" contract (train_r.lua:71-75,
apply_r.lua:65-69).
"""
from __future__ import annotations

import argparse
import dataclasses
import json
from dataclasses import dataclass, field, fields
from typing import Any, Type, TypeVar

T = TypeVar("T", bound="Config")

OPT_METHODS = ("sgd", "adagrad", "adadelta", "adamax", "adam", "rmsprop")
NOISE_METHODS = ("normal", "uniform")
COLOR_SPACES = ("rgb", "yuv", "hsl", "y")


@dataclass
class Config:
    """Base: JSON round-trip + argparse wiring shared by all entry points."""

    def to_dict(self) -> dict[str, Any]:
        return dataclasses.asdict(self)

    def to_json(self) -> str:
        return json.dumps(self.to_dict(), indent=2, sort_keys=True)

    @classmethod
    def from_dict(cls: Type[T], d: dict[str, Any]) -> T:
        known = {f.name for f in fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in known})

    @classmethod
    def from_json(cls: Type[T], s: str) -> T:
        return cls.from_dict(json.loads(s))

    @classmethod
    def parser(cls: Type[T], description: str = "") -> argparse.ArgumentParser:
        p = argparse.ArgumentParser(description=description)
        for f in fields(cls):
            arg = "--" + f.name
            if f.type in ("bool", bool) or isinstance(f.default, bool):
                p.add_argument(arg, action="store_true", default=f.default,
                               help=f.metadata.get("help", ""))
            else:
                typ = type(f.default) if f.default is not None else str
                p.add_argument(arg, type=typ, default=f.default,
                               help=f.metadata.get("help", ""))
        return p

    @classmethod
    def from_args(cls: Type[T], argv=None, description: str = "") -> T:
        ns = cls.parser(description).parse_args(argv)
        return cls(**vars(ns))

    # -- shared geometry helpers -------------------------------------------
    def img_dims(self) -> tuple[int, int, int]:
        """(C, H, W) — channels collapse to 1 for the 'y' color space
        (train.lua:71-75)."""
        c = 1 if getattr(self, "colorSpace", "rgb") == "y" else 3
        return (c, getattr(self, "height", 32), getattr(self, "width", 32))


def _f(default, help=""):
    return field(default=default, metadata={"help": help})


@dataclass
class GanConfig(Config):
    """Flags of train.lua:15-49 (defaults identical)."""
    save: str = _f("logs", "subdirectory to save logs")
    saveFreq: int = _f(30, "save every saveFreq epochs")
    epochs: int = _f(-1, "stop after that many epochs (<0 = run forever). NOTE: the reference's check is inverted and stops immediately (train.lua:208); fixed here, documented in SURVEY.md")
    network: str = _f("", "checkpoint of a previous run to continue")
    G_pretrained_dir: str = _f("logs", "directory with pretrained networks")
    nopretraining: bool = _f(False, "deactivate loading of pretrained networks")
    noplot: bool = _f(False, "disable plots/artifacts while training")
    D_sgd_lr: float = _f(0.02, "D SGD learning rate")
    G_sgd_lr: float = _f(0.02, "G SGD learning rate")
    D_sgd_momentum: float = _f(0.0, "D SGD momentum")
    G_sgd_momentum: float = _f(0.0, "G SGD momentum")
    batchSize: int = _f(32, "batch size")
    N_epoch: int = _f(30, "number of batches per epoch")
    G_L1: float = _f(0.0, "L1 penalty on the weights of G")
    G_L2: float = _f(0.0, "L2 penalty on the weights of G")
    D_L1: float = _f(0.0, "L1 penalty on the weights of D")
    D_L2: float = _f(1e-4, "L2 penalty on the weights of D")
    D_iterations: int = _f(1, "iterations to optimize D for, per batch")
    G_iterations: int = _f(1, "iterations to optimize G for, per batch")
    D_clamp: float = _f(1.0, "clamp D gradients to +/- this")
    G_clamp: float = _f(5.0, "clamp G gradients to +/- this")
    D_optmethod: str = _f("adam", "sgd|adagrad|adadelta|adamax|adam|rmsprop")
    G_optmethod: str = _f("adam", "sgd|adagrad|adadelta|adamax|adam|rmsprop")
    noiseDim: int = _f(32, "dimensionality of the noise vector")
    noiseMethod: str = _f("normal", "normal|uniform")
    seed: int = _f(1, "RNG seed")
    colorSpace: str = _f("rgb", "rgb|yuv|hsl|y")
    height: int = _f(32, "height of the training images")
    width: int = _f(32, "width of the training images")
    dataset: str = _f("NONE", "directory with *.jpg images, or 'synthetic'")
    exact_decode: bool = _f(False, "full-size exact JPEG decode (parity audits); default is DCT-scaled draft decode — bit-exact below 2x originals, |err|<0.05 at >=2x, 1.9-3.1x faster (data/dataset.py)")
    decode_cache: str = _f("", "directory for the decoded-tensor disk cache (data/cache.py): repeated epochs skip JPEG decode; uint8-quantized (max err 0.002), so parity audits leave it off")
    normalize: bool = _f(False, "normalize training data to [-1,1] (the reference's hardcoded NORMALIZE global, train.lua:51,217-218 — exposed as a flag here; mean/std travel in the checkpoint, train.lua:256)")
    init: str = _f("heuristic", "weight init: heuristic (clean default) | torch (reproduce the reference's accidental initial distributions — see models/zoo.py) | xavier | xavier_caffe | kaiming")
    # TPU-native additions (no reference equivalent):
    mesh_data: int = _f(1, "data-parallel mesh axis size (0 = all devices, 1 = single-device)")
    mesh_model: int = _f(1, "tensor-parallel mesh axis size")
    compute_dtype: str = _f("float32", "compute dtype: float32|bfloat16")
    profile_dir: str = _f("", "write a jax.profiler trace of one epoch here")
    prng: str = _f("threefry", "PRNG impl for the root key: threefry (deterministic across backends) | rbg (XLA-native, measured 1.5x faster R training steps on v5e — benchmarks/train_ablate.py)")
    async_save: bool = _f(False, "overlap checkpoint file IO with the next epoch's device work (device snapshot stays synchronous; errors surface at the next save)")
    keep_history: int = _f(0, "also keep the newest N step-stamped checkpoints (adversarial.step<E>); 0 = only latest + .old")
    coordinator_address: str = _f("", "multi-process: host:port of process 0 (jax.distributed); empty = single-process")
    num_processes: int = _f(0, "multi-process: total process count")
    process_id: int = _f(-1, "multi-process: this process's index")


@dataclass
class RConfig(Config):
    """Flags of train_r.lua:12-29 (defaults identical)."""
    save: str = _f("logs", "subdirectory to save logs")
    batchSize: int = _f(32, "batch size")
    nbBatches: int = _f(-1, "max number of batches, <0 is infinite")
    noplot: bool = _f(False, "disable plots/artifacts")
    seed: int = _f(1, "RNG seed")
    saveFreq: int = _f(2000, "save every saveFreq batches")
    R_clamp: float = _f(1.0, "clamp R gradients to +/- this")
    R_L1: float = _f(0.0, "L1 penalty on the weights of R")
    R_L2: float = _f(1e-4, "L2 penalty on the weights of R")
    G: str = _f("logs/adversarial", "checkpoint of the trained G")
    cont: str = _f("", "R checkpoint to continue from (--continue upstream)")
    dataset: str = _f("NONE", "directory with *.jpg images (configured but unused for batches; R trains on (G(z), z) pairs, train_r.lua:138-139)")
    fixer: bool = _f(False, "train the error fixer (always-on input dropout)")
    prng: str = _f("rbg", "PRNG impl for the root key: rbg (default — XLA-native, measured 1.5x faster R training steps on v5e: seven dropout layers' threefry masks cost 13.4 of 40.2 ms, benchmarks/train_ablate.py r3) | threefry (stable streams across backends/XLA versions; use for cross-version reproducibility). R trains on (G(z), z) pairs, so the stream choice changes WHICH random pairs/masks are drawn, never the model family; the reference's torch streams were never reproducible here either way")
    dropout: str = _f("threefry", "dropout-mask source for R's seven dropout layers: threefry (default) | kernel (in-kernel counter-hash masks, ops/dropout_kernel.py — no mask tensor in HBM, deterministic across backends/XLA versions; a different stream than threefry; single-device only — falls back to threefry under --mesh_*/multi-process)")
    async_save: bool = _f(False, "overlap checkpoint file IO with the next segment's device work (device snapshot stays synchronous; errors surface at the next save)")
    # inherited from the G checkpoint at load time (train_r.lua:71-75):
    noiseDim: int = _f(32, "")
    noiseMethod: str = _f("normal", "")
    colorSpace: str = _f("rgb", "")
    height: int = _f(32, "")
    width: int = _f(32, "")
    mesh_data: int = _f(1, "data-parallel mesh axis size (0 = all devices, 1 = single-device)")
    mesh_model: int = _f(1, "tensor-parallel mesh axis size")
    compute_dtype: str = _f("float32", "compute dtype: float32|bfloat16")
    coordinator_address: str = _f("", "multi-process: host:port of process 0 (jax.distributed); empty = single-process")
    num_processes: int = _f(0, "multi-process: total process count")
    process_id: int = _f(-1, "multi-process: this process's index")


@dataclass
class ApplyConfig(Config):
    """Flags of apply_r.lua:13-23 plus the new refinement mode."""
    save: str = _f("logs", "directory with checkpoints / for outputs")
    G: str = _f("logs/adversarial", "G checkpoint")
    R: str = _f("", "R checkpoint (default derived from G's geometry)")
    R_fixer: str = _f("", "fixer-R checkpoint")
    writeto: str = _f("apply_r_results", "output directory for images")
    batchSize: int = _f(32, "inference batch size")
    N: int = _f(10000, "number of faces to generate + invert (apply_r.lua:145)")
    clusters: int = _f(20, "kmeans cluster count (apply_r.lua:158)")
    kmeans_iters: int = _f(15, "kmeans iterations (apply_r.lua:158)")
    needles: int = _f(5, "similarity-search needle count (apply_r.lua:169)")
    anomalies_n: int = _f(1024, "images scored for anomalies (apply_r.lua:187)")
    anomalies_quantile: float = _f(0.15, "anomaly threshold quantile")
    seed: int = _f(1, "RNG seed")
    refine_steps: int = _f(0, "gradient-based latent refinement steps (new; 0 = off)")
    refine_lr: float = _f(0.05, "refinement learning rate (adam on z)")
    pallas: bool = _f(False, "use the measured-fastest optimized paths: folded-BN + lhs-dilated fast G decoder (models/fastpath.py) and the fused Pallas kmeans/cosine-search kernels (ops/). Intended for TPU — off-TPU the kmeans/top-k kernels run in the (very slow) interpreter; ignored for the kernel sections under --mesh_data>1")
    mesh_data: int = _f(1, "shard the N-axis of generation/inversion/search over this many devices (SURVEY.md §5.7 large-N path)")
    mesh_model: int = _f(1, "tensor-parallel axis: shard G/R's big Dense kernels over this many devices (the 128x128/z=256 workload, SURVEY.md §7 step 6); composes with --mesh_data")
    int8: bool = _f(False, "EXPERIMENTAL serving mode: run the generate+invert stage through the int8 weight+activation fast paths (models/fastpath.py int8 variants, ops/quant.py — per-channel symmetric weights with BN folded, dynamic per-tensor activations, int32 accumulation; v5e's MXU does int8 at 2x the bf16 MAC rate). Approximates the bf16 rankings — the measured composed-pipeline recall gate is benchmarks/tpu_kernel_check.py e2e_int8; the fixer-R keeps the module path (needs an rng). Ignored under --mesh_data/--mesh_model>1")
    approx: bool = _f(False, "similarity search via TPU-native approximate k-selection (jax.lax.approx_max_k; measured 17-38x on the all-N shape at recall 0.93-0.99 — RESULTS.md round 3). The reference's rankings are exact, so exact stays the default; takes precedence over --pallas for the search section (the kernels are exact)")
    recall_target: float = _f(0.95, "per-row recall target for --approx (passed to jax.lax.approx_max_k; higher = slower + more accurate). The CPU regression test pins the measured recall against the exact path (tests/test_analysis.py)")
    compute_dtype: str = _f("float32", "compute dtype: float32|bfloat16")


@dataclass
class PretrainGConfig(Config):
    """Flags of pretrain_g.lua:12-35 (defaults identical)."""
    save: str = _f("logs", "subdirectory to save logs")
    saveFreq: int = _f(30, "save every saveFreq epochs")
    epochs: int = _f(-1, "stop after that many epochs (<0 = run forever; the reference's inverted check fixed, pretrain_g.lua:112)")
    network: str = _f("", "reload a pretrained network")
    noplot: bool = _f(False, "disable plots/artifacts")
    batchSize: int = _f(128, "batch size")
    N_epoch: int = _f(30, "batches per epoch")
    G_L1: float = _f(0.0, "L1 penalty on the weights of G")
    G_L2: float = _f(0.0, "L2 penalty on the weights of G")
    G_clamp: float = _f(5.0, "clamp G gradients to +/- this")
    G_optmethod: str = _f("adam", "adam|adagrad")
    noiseDim: int = _f(100, "dimensionality of the bottleneck z")
    noiseMethod: str = _f("normal", "normal|uniform")
    seed: int = _f(1, "RNG seed")
    colorSpace: str = _f("rgb", "rgb|yuv|hsl|y")
    height: int = _f(32, "image height")
    width: int = _f(32, "image width")
    dataset: str = _f("NONE", "directory with *.jpg images, or 'synthetic'")
    exact_decode: bool = _f(False, "full-size exact JPEG decode (parity audits); default is DCT-scaled draft decode — bit-exact below 2x originals, |err|<0.05 at >=2x, 1.9-3.1x faster (data/dataset.py)")
    decode_cache: str = _f("", "directory for the decoded-tensor disk cache (data/cache.py): repeated epochs skip JPEG decode; uint8-quantized (max err 0.002), so parity audits leave it off")
    compute_dtype: str = _f("float32", "compute dtype")


@dataclass
class PretrainPrevConfig(Config):
    """Flags of pretrain_with_previous_net.lua:12-37 (defaults identical)."""
    save: str = _f("logs", "subdirectory to save logs")
    batchSize: int = _f(32, "batch size")
    noplot: bool = _f(False, "disable plots/artifacts")
    seed: int = _f(1, "RNG seed")
    saveFreq: int = _f(50, "save every saveFreq batches")
    colorSpace: str = _f("rgb", "new color space")
    height: int = _f(32, "new image height")
    width: int = _f(32, "new image width")
    G_clamp: float = _f(5.0, "clamp G gradients to +/- this")
    D_clamp: float = _f(1.0, "clamp D gradients to +/- this")
    G_L1: float = _f(0.0, "L1 penalty on the weights of G")
    G_L2: float = _f(0.0, "L2 penalty on the weights of G")
    D_L1: float = _f(0.0, "L1 penalty on the weights of D")
    D_L2: float = _f(1e-4, "L2 penalty on the weights of D")
    noiseDim: int = _f(100, "new noise dimensionality")
    noiseMethod: str = _f("normal", "normal|uniform")
    network: str = _f("logs/adversarial", "previous G+D checkpoint to distill from")
    N_batches: int = _f(1000, "number of distillation batches")
    dataset: str = _f("NONE", "directory with *.jpg images, or 'synthetic'")
    exact_decode: bool = _f(False, "full-size exact JPEG decode (parity audits); default is DCT-scaled draft decode — bit-exact below 2x originals, |err|<0.05 at >=2x, 1.9-3.1x faster (data/dataset.py)")
    decode_cache: str = _f("", "directory for the decoded-tensor disk cache (data/cache.py): repeated epochs skip JPEG decode; uint8-quantized (max err 0.002), so parity audits leave it off")
    compute_dtype: str = _f("float32", "compute dtype")


@dataclass
class SampleConfig(Config):
    """Flags of sample.lua:9-24."""
    save: str = _f("logs", "directory with checkpoints")
    network: str = _f("logs/adversarial", "G+D checkpoint")
    writeto: str = _f("samples", "output directory")
    batchSize: int = _f(32, "inference batch size")
    neighbours: bool = _f(False, "find nearest training-set neighbours of best samples")
    neighbours_max: int = _f(0, "cap on training images scanned by --neighbours (0 = full trainset, like sample.lua:133's loadImages(0, 9999999))")
    runs: int = _f(1, "how often to sample and save images (sample.lua:17); run>1 artifacts get a _NNNN suffix")
    dataset: str = _f("NONE", "directory with *.jpg images, or 'synthetic'")
    exact_decode: bool = _f(False, "full-size exact JPEG decode (parity audits); default is DCT-scaled draft decode — bit-exact below 2x originals, |err|<0.05 at >=2x, 1.9-3.1x faster (data/dataset.py)")
    decode_cache: str = _f("", "directory for the decoded-tensor disk cache (data/cache.py): repeated epochs skip JPEG decode; uint8-quantized (max err 0.002), so parity audits leave it off")
    seed: int = _f(1, "RNG seed")
    colorSpace: str = _f("rgb", "warned-on when it mismatches the checkpoint (sample.lua:210-217); the checkpoint wins")
    height: int = _f(32, "warned-on when it mismatches the checkpoint")
    width: int = _f(32, "warned-on when it mismatches the checkpoint")
    compute_dtype: str = _f("float32", "compute dtype")
