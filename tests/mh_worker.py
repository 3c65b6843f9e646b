"""Multi-host simulation worker: one data-parallel train step over a global
mesh assembled from process-local data. Run as

    python tests/mh_worker.py <process_id> <num_processes> <port>

by tests/test_multihost.py (2 processes x 2 virtual CPU devices = 4-device
global mesh); the test compares loss/param checksums against a single-process
run of the identical global batch."""

import os
import sys


class SynthAsrDataset:
    """Deterministic in-memory dataset with the LibriSpeechDataset duck type."""

    class U:
        def __init__(self, audio_len, label_len):
            self.audio_len = audio_len
            self.label_len = label_len

    def __init__(self, n=16, t=6000, u=4, vocab=9):
        import numpy as np

        self.t, self.u = t, u
        self.rng_audio = [
            np.random.default_rng(100 + i).standard_normal(t).astype(np.float32)
            * 0.1
            for i in range(n)
        ]
        self.labels = [
            np.random.default_rng(200 + i).integers(1, vocab, u).astype(np.int32)
            for i in range(n)
        ]
        self.utterances = [self.U(t, u) for _ in range(n)]

    def __len__(self):
        return len(self.utterances)

    def __getitem__(self, i):
        return self.rng_audio[i], self.labels[i]


def run_step(shard_id: int, num_shards: int):
    """Build loader/trainer, run ONE step, return (loss, param_checksum)."""
    import jax
    import numpy as np

    from efficientconformer_tpu.data.loader import AsrBatchLoader
    from efficientconformer_tpu.parallel import mesh as mesh_lib
    from efficientconformer_tpu.training.trainer import Trainer
    from tests.test_convergence import make_cfg

    cfg = make_cfg("CTC")
    dataset = SynthAsrDataset()
    loader = AsrBatchLoader(
        dataset, 4, accum_steps=1, shuffle=True, seed=0,
        shard_id=shard_id, num_shards=num_shards,
    )
    mesh = mesh_lib.make_mesh(jax.devices()[:4])
    trainer = Trainer(cfg, mesh=mesh)
    micro = {
        "audio": np.zeros((2, 6000), np.float32),
        "labels": np.ones((2, 4), np.int32),
        "audio_len": np.full((2,), 6000, np.int32),
        "label_len": np.full((2,), 4, np.int32),
    }
    state = trainer.init_state(micro)
    state = mesh_lib.globalize(mesh, state)
    batch = next(iter(loader.epoch(0)))
    batch = mesh_lib.shard_batch(mesh, batch, batch_axis=1)
    step = trainer.train_step_fn()
    state, metrics = step(state, batch, jax.random.PRNGKey(7))
    loss = float(metrics["loss"])
    checksum = float(
        sum(jax.numpy.sum(jax.numpy.abs(p)) for p in jax.tree.leaves(state.params))
    )
    return loss, checksum


def run_eval(trainer, state, dataset):
    """Distributed evaluate(): each process decodes its shard, strings are
    gathered, corpus WER computed (reference model.py:457-483). Returns
    (wer, n_utterances, digest-of-all-strings)."""
    import hashlib

    from efficientconformer_tpu.data.tokenizer import BpeTokenizer, UNK_PIECE
    from efficientconformer_tpu.runtime import evaluate

    tok = BpeTokenizer(
        [UNK_PIECE] + [chr(ord("a") + i) for i in range(8)], [])
    wer_val, truths, preds, _ = evaluate(
        trainer, state, dataset, tok, batch_size=4, max_consec=2)
    # gathered order differs by topology (process shards concatenate), but
    # the (truth, pred) PAIRING must be identical — digest sorted pairs
    pairs = sorted(zip(truths, preds))
    digest = hashlib.sha256(repr(pairs).encode()).hexdigest()[:12]
    return wer_val, len(truths), digest


def run_all(shard_id: int, num_shards: int, ckpt_dir=None):
    """Train step + distributed evaluate (+ optional orbax save)."""
    import jax
    import numpy as np

    from efficientconformer_tpu.data.loader import AsrBatchLoader
    from efficientconformer_tpu.parallel import mesh as mesh_lib
    from efficientconformer_tpu.training.trainer import Trainer
    from tests.test_convergence import make_cfg

    cfg = make_cfg("CTC")
    dataset = SynthAsrDataset()
    loader = AsrBatchLoader(
        dataset, 4, accum_steps=1, shuffle=True, seed=0,
        shard_id=shard_id, num_shards=num_shards,
    )
    mesh = mesh_lib.make_mesh(jax.devices()[:4])
    trainer = Trainer(cfg, mesh=mesh)
    micro = {
        "audio": np.zeros((2, 6000), np.float32),
        "labels": np.ones((2, 4), np.int32),
        "audio_len": np.full((2,), 6000, np.int32),
        "label_len": np.full((2,), 4, np.int32),
    }
    state = trainer.init_state(micro)
    state = mesh_lib.globalize(mesh, state)
    batch = next(iter(loader.epoch(0)))
    batch = mesh_lib.shard_batch(mesh, batch, batch_axis=1)
    step = trainer.train_step_fn()
    state, metrics = step(state, batch, jax.random.PRNGKey(7))
    loss = float(metrics["loss"])
    checksum = float(
        sum(jax.numpy.sum(jax.numpy.abs(p)) for p in jax.tree.leaves(state.params))
    )
    wer_val, n_utt, digest = run_eval(trainer, state, dataset)
    if ckpt_dir:
        from efficientconformer_tpu.training import checkpoint

        checkpoint.save(os.path.join(ckpt_dir, "ckpt"), state, fmt="orbax")
    return loss, checksum, wer_val, n_utt, digest


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    ckpt_dir = sys.argv[4] if len(sys.argv) > 4 else None
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    os.environ["JAX_PLATFORMS"] = "cpu"
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))) + "/tests")
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")
    jax.distributed.initialize(f"localhost:{port}", num_processes=nproc,
                               process_id=pid)
    loss, checksum, wer_val, n_utt, digest = run_all(pid, nproc, ckpt_dir)

    # string gather across processes (multi-host WER path)
    from efficientconformer_tpu.runtime import gather_strings

    gathered = gather_strings([f"host-{pid}-a", f"host-{pid}-b"])
    print(f"RESULT pid={pid} loss={loss:.6f} checksum={checksum:.4f} "
          f"gathered={','.join(sorted(gathered))} "
          f"wer={wer_val:.6f} n_utt={n_utt} digest={digest}", flush=True)


if __name__ == "__main__":
    main()
