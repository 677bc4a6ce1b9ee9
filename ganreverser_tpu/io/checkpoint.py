"""Checkpointing — the §3.6 cross-script contract, pytree-native.

Replaces torch.save of whole serialized module trees (train.lua:241-257)
with a directory of (manifest.json + arrays.npz):

* the config travels with the checkpoint and downstream scripts trust it
  (train_r.lua:71-75, apply_r.lua:65-69);
* optimizer state IS saved — improving on the reference, which resets adam
  moments on resume (train.lua:183-193, SURVEY.md §5.4);
* before overwrite, the previous checkpoint is renamed ``<name>.old``
  (train.lua:250-252) and keep-N retention is available;
* filename conventions mirror the reference
  (``r_<C>x<H>x<W>_nd<z>_<method>[_fixer]`` etc., train_r.lua:232).

The reference's prepareNetworkForSave buffer-shrinking (nn_utils.lua:395-415)
has no equivalent here: pure pytrees carry no temp buffers.
"""
from __future__ import annotations

import json
import os
import shutil
import threading
from typing import Any, Optional

import jax
import numpy as np

_LEAF = "@npz:"


def _encode(tree, arrays: dict, prefix: str):
    """Recursively encode a pytree into a JSON skeleton + npz array dict."""
    if isinstance(tree, dict):
        return {k: _encode(v, arrays, f"{prefix}/{k}") for k, v in tree.items()}
    if isinstance(tree, (list, tuple)):
        enc = [_encode(v, arrays, f"{prefix}/{i}") for i, v in enumerate(tree)]
        return {"__tuple__": enc} if isinstance(tree, tuple) else enc
    if tree is None or isinstance(tree, (bool, int, float, str)):
        return tree
    arr = np.asarray(tree)
    key = prefix.lstrip("/") or "root"
    arrays[key] = arr
    return _LEAF + key


def _decode(skel, arrays):
    if isinstance(skel, dict):
        if "__tuple__" in skel and len(skel) == 1:
            return tuple(_decode(v, arrays) for v in skel["__tuple__"])
        return {k: _decode(v, arrays) for k, v in skel.items()}
    if isinstance(skel, list):
        return [_decode(v, arrays) for v in skel]
    if isinstance(skel, str) and skel.startswith(_LEAF):
        return arrays[skel[len(_LEAF):]]
    return skel


def save_checkpoint(path: str, tree: Any, *, config: Optional[dict] = None,
                    extra: Optional[dict] = None, backup_old: bool = True,
                    keep: Optional[int] = None) -> str:
    """Save a pytree checkpoint to directory ``path``.

    ``config``: JSON-serializable run config (the reference's embedded opt).
    ``extra``: small JSON metadata (epoch, step, ...).
    ``backup_old``: rename an existing checkpoint to ``<path>.old`` first.
    ``keep``: keep-N retention over ``<path>.step<NNN>`` siblings (new).
    """
    path = os.path.abspath(path)
    tmp = path + ".tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    os.makedirs(tmp)

    arrays: dict = {}
    skeleton = _encode(jax.device_get(tree), arrays, "")
    manifest = {"skeleton": skeleton, "config": config or {},
                "extra": extra or {}, "format": 1}
    with open(os.path.join(tmp, "manifest.json"), "w") as f:
        json.dump(manifest, f)
    np.savez(os.path.join(tmp, "arrays.npz"), **arrays)

    if os.path.exists(path):
        if backup_old:
            old = path + ".old"
            if os.path.exists(old):
                shutil.rmtree(old)
            os.rename(path, old)
        else:
            shutil.rmtree(path)
    os.rename(tmp, path)

    if keep is not None:
        _retain(path, keep)
    return path


# -- async saving -----------------------------------------------------------
# At the flagship geometry a train checkpoint is hundreds of MB (G+D params
# + adam moments); the zip write + renames take seconds on a 1-core host.
# Overlap them with the next epoch's device work. The device->host snapshot
# stays SYNCHRONOUS in the caller: the epoch programs donate their input
# buffers, so a background device_get could race the next dispatch's
# donation and read a deleted buffer.

_save_lock = threading.Lock()
_save_thread: Optional[threading.Thread] = None
_save_error: Optional[BaseException] = None


def _atexit_join() -> None:
    """Surface a stored background-write error at interpreter exit.

    Ordering note (why daemon=False is the load-bearing part): CPython
    joins non-daemon threads in threading._shutdown BEFORE atexit
    callbacks run, so by the time this handler fires the write has
    already completed and the join below is a no-op — its purpose is the
    error print (an exception between saves would otherwise swallow a
    stored failure). Reverting the writer to daemon=True would reintroduce
    the truncated-checkpoint window: a daemon thread is killed mid-rename
    on abnormal exit and NOTHING joins it."""
    global _save_thread
    with _save_lock:
        t, _save_thread = _save_thread, None
    if t is not None:
        t.join()
    if _save_error is not None:
        import sys
        print(f"[checkpoint] background save failed: {_save_error!r}",
              file=sys.stderr)


import atexit as _atexit  # noqa: E402 — registered once at import

_atexit.register(_atexit_join)


def wait_for_saves() -> None:
    """Join any in-flight async save; re-raise its error here (the train
    CLIs call this before final saves and at exit, so a failed background
    write can never be silently dropped)."""
    global _save_thread, _save_error
    with _save_lock:
        t, _save_thread = _save_thread, None
    if t is not None:
        t.join()
    err = _save_error
    if err is not None:
        _save_error = None
        raise err


def save_checkpoint_async(path: str, tree: Any, *,
                          config: Optional[dict] = None,
                          extra: Optional[dict] = None,
                          backup_old: bool = True,
                          keep: Optional[int] = None) -> str:
    """``save_checkpoint`` with the file IO in a background thread.

    Joins the previous in-flight save first (at most one outstanding, so
    the ``.old`` backup ordering is preserved), snapshots the pytree to
    host synchronously, then writes manifest+npz and performs the renames
    off-thread. Errors surface on the next call or ``wait_for_saves()``.
    """
    global _save_thread
    wait_for_saves()
    host_tree = jax.device_get(tree)
    # snapshot the JSON metadata too: the caller keeps mutating its
    # plot_data/config objects during the next epoch while the background
    # thread serializes them (train.py passes the live list)
    import copy
    config = copy.deepcopy(config)
    extra = copy.deepcopy(extra)

    def work():
        global _save_error
        try:
            save_checkpoint(path, host_tree, config=config, extra=extra,
                            backup_old=backup_old, keep=keep)
        except BaseException as e:  # noqa: BLE001 — stored, re-raised on join
            _save_error = e

    # NON-daemon: a daemon writer killed mid-rename by an abnormal main-
    # thread exit (NaN abort, uncaught error) could leave only <path>.old
    # on disk — the newest checkpoint silently destroyed. Non-daemon means
    # the interpreter waits for the in-flight write even when the train
    # loop dies before its wait_for_saves().
    t = threading.Thread(target=work, name="ckpt-save", daemon=False)
    with _save_lock:
        _save_thread = t
    t.start()
    return path


def load_checkpoint(path: str):
    """Returns (tree, config, extra)."""
    path = os.path.abspath(path)
    if not os.path.isfile(os.path.join(path, "manifest.json")):
        raise FileNotFoundError(
            f"no checkpoint at {path!r} (expected a directory containing "
            "manifest.json + arrays.npz — train the corresponding model "
            "first, or check --save/--G/--R paths)")
    with open(os.path.join(path, "manifest.json")) as f:
        manifest = json.load(f)
    with np.load(os.path.join(path, "arrays.npz")) as npz:
        arrays = {k: npz[k] for k in npz.files}
    tree = _decode(manifest["skeleton"], arrays)
    return tree, manifest.get("config", {}), manifest.get("extra", {})


def exists(path: str) -> bool:
    return os.path.isfile(os.path.join(path, "manifest.json"))


def _retain(path: str, keep: int):
    """Keep the newest ``keep`` step-suffixed siblings of ``path`` —
    numeric sort, so step10 outlives step9."""
    base = os.path.basename(path)
    parent = os.path.dirname(path)

    def step_of(name: str) -> int:
        try:
            return int(name[len(base + ".step"):])
        except ValueError:
            return -1

    sibs = sorted(
        (d for d in os.listdir(parent)
         if d.startswith(base + ".step") and
         os.path.isdir(os.path.join(parent, d))),
        key=step_of)
    for d in sibs[:-keep] if keep > 0 else sibs:
        shutil.rmtree(os.path.join(parent, d))


# -- filename conventions (§3.6) -------------------------------------------

def adversarial_name(save_dir: str) -> str:
    return os.path.join(save_dir, "adversarial")


def r_name(save_dir: str, c: int, h: int, w: int, noise_dim: int,
           method: str, fixer: bool) -> str:
    """train_r.lua:232: r_<C>x<H>x<W>_nd<z>_<method>[_fixer]."""
    suffix = "_fixer" if fixer else ""
    return os.path.join(save_dir, f"r_{c}x{h}x{w}_nd{noise_dim}_{method}{suffix}")


def g_pretrained_name(save_dir: str, c: int, h: int, w: int,
                      noise_dim: int) -> str:
    """pretrain_g.lua:191-202 / train.lua:148."""
    return os.path.join(save_dir, f"g_pretrained_{c}x{h}x{w}_nd{noise_dim}")


def pretrained_name(save_dir: str, c: int, h: int, w: int,
                    noise_dim: int) -> str:
    """pretrain_with_previous_net.lua:260-266 / train.lua:127."""
    return os.path.join(save_dir, f"pretrained_{c}x{h}x{w}_nd{noise_dim}")
