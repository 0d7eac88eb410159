"""Checkpointing: orbax pytree checkpoints with the reference's semantics.

Twin of train.py:199-212 / 151-168: save ``{params, batch_stats, log_vars,
step, epoch, best_rmse}`` every epoch to ``checkpoint/``, snapshot
``checkpoint{N}`` every 5 epochs, copy ``model_best`` on improvement, and
resume restoring weights + epoch + log_vars. Like the reference, optimizer
state is NOT saved/restored by default (train.py:163-164,207 commented out);
pass ``save_opt_state=True`` (and it restores automatically) for exact
resume — the TPU-native extra the reference lacks. (The reference's
``best_acc`` min-update bug — initialised to 0 so ``model_best.tar`` never
refreshes, SURVEY.md §5.4 — is *fixed* here: best starts at +inf.)
"""
from __future__ import annotations

import os
import shutil
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _ckptr():
    return ocp.PyTreeCheckpointer()


def commit_payload(path: str, payload: dict) -> None:
    """Crash-safe orbax dir save: write to ``<path>.tmp``, park the live dir
    at ``<path>.old``, rename tmp into place, then delete old — at every
    instant at least one complete checkpoint exists on disk, and
    :func:`load_checkpoint` falls back to ``.old`` if a crash landed inside
    the swap window. Shared by the trainer and SR-GAN checkpoint writers."""
    path = os.path.abspath(path)
    tmp, old = path + ".tmp", path + ".old"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    _ckptr().save(tmp, payload)
    # Park the live dir only when one exists; in the crash-recovery state
    # (path absent, .old live) .old must survive untouched until the new
    # checkpoint is renamed into place — deleting it first would leave a
    # window with NO loadable checkpoint if we crash again before the
    # final os.replace.
    if os.path.exists(path):
        if os.path.exists(old):
            shutil.rmtree(old)
        os.replace(path, old)
    os.replace(tmp, path)
    if os.path.exists(old):
        shutil.rmtree(old)


_pending_save = None  # most recent async save (serialises successive saves)
_pending_error = None  # exception raised by the last async commit, if any


def wait_for_saves():
    """Block until the in-flight async save (if any) has committed.

    Re-raises any exception the background commit hit (a full disk must
    fail the run, not surface at resume time as a missing checkpoint)."""
    global _pending_save, _pending_error
    if _pending_save is not None:
        t, _pending_save = _pending_save, None
        t.join()
    if _pending_error is not None:
        err, _pending_error = _pending_error, None
        raise RuntimeError("async checkpoint save failed") from err


def save_checkpoint(logdir: str, state, epoch: int, best_rmse: float,
                    snapshot_every: int = 5, is_best: bool = False,
                    save_opt_state: bool = False, async_save: bool = False):
    """Write ``checkpoint/`` (+ ``checkpoint{epoch}/``, ``model_best/``).

    ``save_opt_state=True`` additionally persists the optax state (Adam
    moments + injected hyperparams, as a flax state-dict so orbax sees only
    plain containers), enabling bitwise-exact resume.

    ``async_save=True`` (SURVEY.md §5.3 "async checkpointing every N
    steps"): the device->host pull happens synchronously (so the training
    loop may donate/overwrite its buffers immediately), but serialisation
    and the crash-safe dir swap run on a background thread — the step loop
    never stalls on disk. Successive saves are serialised against each
    other; call :func:`wait_for_saves` before reading the files back."""
    payload = {
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
        "log_vars": np.asarray(state.log_vars),
        "step": int(state.step),
        "epoch": int(epoch),
        "best_rmse": float(best_rmse),
    }
    if save_opt_state:
        from flax import serialization

        payload["opt_state"] = jax.device_get(
            serialization.to_state_dict(state.opt_state))
    path = os.path.abspath(os.path.join(logdir, "checkpoint"))

    def _commit():
        commit_payload(path, payload)
        if snapshot_every and epoch % snapshot_every == 0:
            snap = os.path.abspath(os.path.join(logdir, f"checkpoint{epoch}"))
            if os.path.exists(snap):
                shutil.rmtree(snap)
            shutil.copytree(path, snap)
        if is_best:
            best = os.path.abspath(os.path.join(logdir, "model_best"))
            if os.path.exists(best):
                shutil.rmtree(best)
            shutil.copytree(path, best)

    if async_save:
        import threading

        global _pending_save
        wait_for_saves()  # serialise with the previous in-flight save
        # (and surface its failure HERE, at the next save)

        def _commit_capture():
            global _pending_error
            try:
                _commit()
            except BaseException as e:  # noqa: BLE001 — re-raised on wait
                _pending_error = e

        t = threading.Thread(target=_commit_capture, daemon=False)
        t.start()
        _pending_save = t
    else:
        wait_for_saves()
        _commit()
    return path


def load_checkpoint(path: str) -> Optional[dict]:
    """Restore a checkpoint dict, or None if absent (resume-from-scratch).

    Falls back to ``<path>.old`` — the previous checkpoint parked by
    :func:`commit_payload`'s swap — if a crash landed mid-swap."""
    path = os.path.abspath(path)
    if os.path.isdir(path):
        return _ckptr().restore(path)
    if os.path.isdir(path + ".old"):
        return _ckptr().restore(path + ".old")
    if os.path.isfile(path) and path.endswith(".npz"):
        return _payload_from_npz(path)
    return None


def _payload_from_npz(path: str) -> dict:
    """Adapt a ``train.convert``-CLI ``.npz`` (the migration format for
    reference ``.tar`` checkpoints, train.py:199-212) into the live
    checkpoint payload shape, so ``cfg.checkpoint`` / ``cfg.logdirhr``
    can point straight at a converted file — the exact path a user with
    a published reference checkpoint takes (tar → convert → main_test /
    predict)."""
    from srbh_tpu.train.convert import load_tree_npz

    tree = load_tree_npz(path)
    payload = dict(tree)
    meta = payload.pop("meta", {})
    lv = payload.get("log_vars")
    if isinstance(lv, dict):  # converter stashes {'w1': …} scalars
        payload["log_vars"] = np.stack(
            [np.asarray(lv[k], np.float32)
             for k in sorted(lv, key=lambda s: int(s[1:]))])
    payload.setdefault("epoch", int(meta.get("epoch", 0)))
    if "best_acc" in meta:
        payload.setdefault("best_rmse", float(meta["best_acc"]))
    return payload


def restore_into_state(state, payload: dict):
    """Rebuild a TrainState's variable leaves from a checkpoint payload.

    By default optimiser state is absent from checkpoints and is not
    restored, matching the reference's resume (train.py:163-164 commented
    out). If the checkpoint was written with ``save_opt_state=True`` the
    optax state is restored too (exact resume).
    """
    import jax.numpy as jnp

    tree = jax.tree_util.tree_map(jnp.asarray, payload["params"])
    stats = jax.tree_util.tree_map(jnp.asarray, payload["batch_stats"])
    # A converted bare-state_dict tar (train/convert.py supports payloads
    # without 'log_vars', e.g. encoder-only or SR checkpoints) has no
    # log_vars; keep the state's current ones (zeros on a fresh state —
    # the reference's init, train.py:178) rather than KeyError-ing. They
    # only matter when resuming TRAINING mid-run, and a tar that carried
    # them restores them exactly.
    lv = payload.get("log_vars")
    if lv is None:
        import warnings

        warnings.warn(
            "checkpoint payload has no log_vars; keeping the current "
            "(fresh-init) values — fine for eval/predict, but a training "
            "resume will restart the adaptive loss weights", stacklevel=2)
        lv = state.log_vars
    state = state.replace(
        params=tree,
        batch_stats=stats,
        log_vars=jnp.asarray(lv),
        step=jnp.asarray(payload.get("step", 0), jnp.int32),
    )
    if payload.get("opt_state") is not None:
        from flax import serialization

        opt_state = serialization.from_state_dict(
            state.opt_state, payload["opt_state"])
        state = state.replace(
            opt_state=jax.tree_util.tree_map(jnp.asarray, opt_state))
    return state
