"""CLI: supervised water–fat training (reference train-sup.py)."""

from __future__ import annotations

import jax
import numpy as np

from ..parallel import data_mesh_for_batch, shard_batch
from ..train import sup
from ..train.common import batch_iterator
from ..utils import Checkpoint, DictSummaryWriter
from ..utils.preempt import PreemptionGuard
from .common import (load_cohorts, setup_experiment,
                     warn_f32_compiler_crash)


def main(argv=None):
    cfg = setup_experiment({**sup.DEFAULTS, "DL_gen_dir": ""}, argv)
    warn_f32_compiler_crash(cfg)
    if cfg["DL_gen"]:
        # DL-generated corpus (reference --DL_gen, train-sup.py:101-164):
        # read npz shards, optionally prepend real slices.
        from .. import physics
        from ..data.records import list_shards, mix_partial_real, read_shards
        shards = list_shards(cfg["DL_gen_dir"], prefix=cfg["DL_filename"])
        if not shards:
            raise FileNotFoundError(
                f"no generated shards '{cfg['DL_filename']}*.npz' in "
                f"{cfg['DL_gen_dir']}")
        acqs, maps = read_shards(shards)
        # generated maps are mag/phase rows; the trainer consumes
        # complex-MEBCRN rows
        from ..data.layouts import mag_phase_to_complex_mebcrn
        import jax.numpy as jnp
        maps = np.asarray(mag_phase_to_complex_mebcrn(jnp.asarray(maps)))
        if cfg["DL_partial_real"] > 0:
            r_acqs, r_maps, _ = load_cohorts(cfg)
            end_idx = {2: 64, 6: 200, 10: 330}.get(cfg["DL_partial_real"], 0)
            acqs, maps = mix_partial_real(acqs, maps, r_acqs, r_maps,
                                          end_idx)
        te = np.asarray(physics.te_train(acqs.shape[1], bs=len(acqs)))
    else:
        acqs, maps, te = load_cohorts(cfg)
    n = len(acqs)
    steps_per_epoch = max(n // cfg["batch_size"], 1)
    cfg["total_steps"] = steps_per_epoch * cfg["epochs"]

    model = sup.build_model(cfg)
    step_fn, tx = sup.make_train_step(cfg, model)
    eval_fn = sup.make_eval_step(cfg, model)
    key = jax.random.PRNGKey(0)
    state = sup.init_state(cfg, model, tx, key, acqs[:1])

    # hold out a validation split (reference uses a separate cohort;
    # summaries/validation writer parity, train-sup.py:470-471)
    n_val = max(len(acqs) // 10, cfg["batch_size"])         if len(acqs) > 2 * cfg["batch_size"] else 0
    val = (acqs[:n_val], maps[:n_val], te[:n_val]) if n_val else None
    if n_val:
        acqs, maps, te = acqs[n_val:], maps[n_val:], te[n_val:]

    mesh = data_mesh_for_batch(cfg["batch_size"])
    ckpt = Checkpoint(f"{cfg['output_dir']}/checkpoints")
    writer = DictSummaryWriter(f"{cfg['output_dir']}/summaries/train")
    val_writer = DictSummaryWriter(
        f"{cfg['output_dir']}/summaries/validation") if n_val else None
    start = ckpt.latest_step() or 0
    if start:
        state = ckpt.restore(jax.device_get(state), start)
        print(f"resumed from epoch {start}")

    from ..utils.timer import profile

    rng = np.random.default_rng(0)
    gstep = start * steps_per_epoch
    prof_ctx = profile(cfg.get("profile_dir") or None)
    prof_ctx.__enter__()
    guard = PreemptionGuard()
    for ep in range(start, cfg["epochs"]):
        for batch in batch_iterator((acqs, maps, te), cfg["batch_size"], rng,
                                    shuffle=cfg["shuffle"]):
            key, sub = jax.random.split(key)
            state, metrics = step_fn(state, shard_batch(batch, mesh), sub)
            gstep += 1
            if gstep % 20 == 0:
                writer.write(jax.device_get(metrics), gstep, name="G_losses")
        if val_writer is not None:
            vb = tuple(v[:cfg["batch_size"]] for v in val)
            vmetrics = eval_fn(state, shard_batch(vb, mesh), key)
            val_writer.write(jax.device_get(vmetrics), gstep,
                             name="G_losses")
        if ((ep + 1) % cfg["epoch_ckpt"] == 0 or ep + 1 == cfg["epochs"]
                or guard.should_stop):
            ckpt.save(ep + 1, jax.device_get(state))
        if guard.should_stop:
            print(f"preempted: checkpointed epoch {ep + 1}, exiting")
            break
        print(f"epoch {ep + 1}/{cfg['epochs']} "
              f"G_loss={float(metrics['G_loss']):.5f}")
    prof_ctx.__exit__(None, None, None)
    writer.close()
    ckpt.close()


if __name__ == "__main__":
    main()
