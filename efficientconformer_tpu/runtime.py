"""Runtime mode dispatch (reference main.py:27-178 + Model.evaluate /
eval_time* / swa, models/model.py:386-726).

Wires config -> tokenizer -> datasets -> Trainer and runs the requested mode.
Evaluation decodes on device (batched greedy CTC / transducer), detokenises and
scores WER on host.
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from efficientconformer_tpu.config import Config, load_config
from efficientconformer_tpu.data.datasets import LibriSpeechDataset
from efficientconformer_tpu.data.loader import AsrBatchLoader
from efficientconformer_tpu.data.tokenizer import BpeTokenizer
from efficientconformer_tpu.models import model_ctc as ctc_mod
from efficientconformer_tpu.models import transducer as rnnt_mod
from efficientconformer_tpu.training.trainer import Trainer
from efficientconformer_tpu.training import checkpoint
from efficientconformer_tpu.utils.metrics import wer

# mode -> (train split, eval split); mirrors reference functions.py:85-227
EVAL_SPLITS = {
    "training": "dev-clean",
    "training-clean": "dev-clean",
    "validation-clean": "dev-clean",
    "validation-other": "dev-other",
    "test-clean": "test-clean",
    "test-other": "test-other",
    "eval_time": "dev-clean",
    "eval_time_encoder": "dev-clean",
    "eval_time_decoder": "dev-clean",
}
TRAIN_SPLITS = {"training": "train", "training-clean": "train-clean"}


def load_tokenizer(config: Config) -> Optional[BpeTokenizer]:
    path = config.tokenizer_params.get("tokenizer_path")
    try:
        return BpeTokenizer.load(path)
    except (FileNotFoundError, TypeError, json.JSONDecodeError):
        print("Tokenizer not found...")
        return None


def example_microbatch(config: Config, batch_size: int = 2):
    """Tiny statically-shaped batch for parameter initialisation."""
    if config.model_type == "LM":
        u = 16
        return {
            "tokens": np.zeros((batch_size, u), np.int32),
            "token_len": np.full((batch_size,), u, np.int32),
            "targets": np.zeros((batch_size, u + 1), np.int32),
        }
    # keep labels short enough that a CTC/RNN-T path exists even through an
    # 8x-downsampling encoder (16000 samples -> ~13 frames)
    t, u = 16000, 6
    rng = np.random.default_rng(0)
    return {
        "audio": rng.standard_normal((batch_size, t)).astype(np.float32) * 0.01,
        "labels": rng.integers(1, 8, (batch_size, u)).astype(np.int32),
        "audio_len": np.full((batch_size,), t, np.int32),
        "label_len": np.full((batch_size,), u, np.int32),
    }


def greedy_token_cap(config: Config, audio_frames: int, max_consec: int) -> int:
    """Upper bound on greedy-transducer emissions, derived from the *input*
    length only (never from ground-truth labels): each encoder output frame can
    emit at most max_consec tokens. Rounded up to a multiple of 32 to bound the
    number of compiled decode programs."""
    from efficientconformer_tpu.config import encoder_output_frames

    f = encoder_output_frames(config.encoder_params, audio_frames)
    cap = max(f * max_consec, 32)
    return -(-cap // 32) * 32


def decode_batch(trainer: Trainer, state, batch, tokenizer,
                 max_consec: int = 5, beam_size: int = 1, lm=None):
    """Decode one eval microbatch -> list[str]. beam_size > 1 uses beam search
    with the config's decoding_params (n-gram / LM fusion when files exist).
    ``lm`` is an optional fusion bundle from ``load_lm_for_fusion``."""
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    dp = trainer.config.decoding_params
    if config_is_transducer(trainer.config):
        if beam_size > 1:
            from efficientconformer_tpu.decoding.ngram import try_load

            lm_kwargs = {}
            if lm is not None:
                lm_kwargs = dict(
                    lm_model=lm["model"], lm_variables=lm["variables"],
                    lm_weight=lm["weight"], lm_tmp=lm["tmp"],
                )
            ngram = try_load(dp.get("ngram_path"), dp.get("ngram_offset", 100))
            use_ngram = ngram is not None and dp.get("ngram_alpha", 0.0)
            if not os.environ.get("ECF_HOST_BEAM"):
                # Default path: one jit program, zero host round trips.
                # N-gram rescoring runs on device too (packed ARPA tables,
                # decoding/ngram_device.py).
                from efficientconformer_tpu.decoding.rnnt_beam_device import (
                    beam_search_device,
                )

                ng_kwargs = {}
                if use_ngram:
                    ng_kwargs = dict(
                        ngram=ngram,
                        ngram_alpha=dp.get("ngram_alpha", 0.0),
                        ngram_beta=dp.get("ngram_beta", 0.0),
                    )
                token_lists = beam_search_device(
                    trainer.model, variables,
                    jnp.asarray(batch["audio"]),
                    jnp.asarray(batch["audio_len"]),
                    beam_size=beam_size,
                    tmp=dp.get("tmp", 1.0),
                    max_tokens=greedy_token_cap(
                        trainer.config, batch["audio"].shape[1], max_consec
                    ),
                    **lm_kwargs, **ng_kwargs,
                )
                return tokenizer.decode(token_lists)

            # Host-orchestrated fallback (ECF_HOST_BEAM=1): the
            # reference-semantics oracle, kept for A/B measurement; the
            # per-sample variant serves LMs without fixed-shape carries.
            from efficientconformer_tpu.decoding.rnnt_beam import (
                beam_search,
                beam_search_batched,
            )

            fn = (
                beam_search
                if lm is not None and lm.get("arch") == "Transformer"
                else beam_search_batched
            )
            token_lists = fn(
                trainer.model, variables,
                jnp.asarray(batch["audio"]), jnp.asarray(batch["audio_len"]),
                beam_size=beam_size,
                tmp=dp.get("tmp", 1.0),
                ngram=ngram,
                ngram_alpha=dp.get("ngram_alpha", 0.0),
                ngram_beta=dp.get("ngram_beta", 0.0),
                **lm_kwargs,
            )
            return tokenizer.decode(token_lists)
        max_tokens = greedy_token_cap(
            trainer.config, batch["audio"].shape[1], max_consec
        )
        toks, n = rnnt_mod.greedy_decode(
            trainer.model, variables,
            jnp.asarray(batch["audio"]), jnp.asarray(batch["audio_len"]),
            max_tokens=max_tokens, max_consec_dec_steps=max_consec,
        )
    else:
        if beam_size > 1:
            logits, logits_len, _ = trainer.model.apply(
                variables, jnp.asarray(batch["audio"]),
                jnp.asarray(batch["audio_len"]), False,
            )
            logp = jax.nn.log_softmax(
                logits.astype(jnp.float32) / dp.get("tmp", 1.0), axis=-1
            )
            if not os.environ.get("ECF_HOST_BEAM"):
                # Default path: prefix beam + n-gram entirely on device
                # (frame-synchronous lax.scan, decoding/ctc_beam_device.py).
                from efficientconformer_tpu.decoding.ctc_beam_device import (
                    ctc_beam_search_device,
                )
                from efficientconformer_tpu.decoding.ngram import try_load

                ngram = try_load(
                    dp.get("ngram_path"), dp.get("ngram_offset", 100)
                )
                token_lists = ctc_beam_search_device(
                    logp, logits_len, beam_size,
                    ngram=ngram,
                    alpha=dp.get("ngram_alpha", 0.0),
                    beta=dp.get("ngram_beta", 0.0),
                )
                return tokenizer.decode(token_lists)

            # host C++/Python beam (ECF_HOST_BEAM=1): reference-semantics
            # oracle, also exposes ctcdecode's cutoff_top_n pruning
            from efficientconformer_tpu.decoding.ctc_beam import beam_search_batch

            token_lists = beam_search_batch(
                np.asarray(logp), np.asarray(logits_len), beam_size,
                lm_path=dp.get("ngram_path"),
                alpha=dp.get("ngram_alpha", 0.0),
                beta=dp.get("ngram_beta", 0.0),
                ngram_offset=dp.get("ngram_offset", 100),
                cutoff_top_n=dp.get("cutoff_top_n", 0),
            )
            return tokenizer.decode(token_lists)
        toks, n = ctc_mod.greedy_decode(
            trainer.model, variables,
            jnp.asarray(batch["audio"]), jnp.asarray(batch["audio_len"]),
        )
    toks, n = np.asarray(toks), np.asarray(n)
    return tokenizer.decode([toks[b, : n[b]].tolist() for b in range(len(n))])


def config_is_transducer(config: Config) -> bool:
    return config.model_type == "Transducer"


def load_lm_for_fusion(config: Config, lm_epoch: str):
    """Load the shallow-fusion LM named by decoding_params["lm_config"] at
    checkpoint epoch ``lm_epoch`` (reference main.py:69-79). Returns a bundle
    {model, variables, weight, tmp, arch} for decode_batch."""
    dp = config.decoding_params
    lm_config = load_config(dp["lm_config"])
    lm_trainer = Trainer(lm_config)
    lm_state = lm_trainer.init_state(example_microbatch(lm_config))
    lm_cb = lm_config.training_params.get("callback_path", "callbacks/")
    lm_state = checkpoint.load(
        os.path.join(lm_cb, f"checkpoints_{lm_epoch}.ckpt"), lm_state
    )
    return {
        "model": lm_trainer.model,
        "variables": {"params": lm_state.params,
                      "batch_stats": lm_state.batch_stats},
        "weight": dp.get("lm_weight", 0.0),
        "tmp": dp.get("lm_tmp", 1.0),
        "arch": lm_config.lm_params.get("arch", "RNN"),
    }


def evaluate_lm(trainer: Trainer, state, dataset, *,
                batch_size: int = 8, eval_steps: Optional[int] = None):
    """LM evaluation on labels-only LibriSpeech transcripts -> mean CE loss
    (reference §3.4: lm_mode datasets + eval_loss, model.py:438-442)."""
    from efficientconformer_tpu.data.loader import LmBatchLoader

    loader = LmBatchLoader(
        dataset, batch_size, max_len=dataset.max_label_len,
        shuffle=False, drop_last=False,
    )
    loss_fn = trainer.eval_loss_fn()
    total, n = 0.0, 0
    for i, batch in enumerate(loader.epoch(0)):
        mb = {k: jnp.asarray(v.reshape((-1,) + v.shape[2:]))
              for k, v in batch.items()}
        total += float(loss_fn(state, mb))
        n += 1
        if eval_steps and i + 1 >= eval_steps:
            break
    return total / n if n else float("nan")


def evaluate(trainer: Trainer, state, dataset, tokenizer, *,
             batch_size: int = 8, eval_steps: Optional[int] = None,
             verbose: bool = False, max_consec: int = 5, beam_size: int = 1,
             eval_loss: bool = False, lm=None, num_workers: int = 0,
             audio_pad_align: Optional[int] = None):
    """Evaluation -> (wer, truths, preds, mean_loss). Reference model.py:386-490.

    Multi-host: each process decodes its shard of the dataset, then the
    string lists are gathered across processes before the corpus-level WER
    (the reference's all_gather_object, model.py:457-477).

    ``audio_pad_align`` keeps eval buckets SP-divisible under a seq mesh so
    evaluation doesn't silently degrade to data parallelism (ADVICE r4)."""
    nproc = jax.process_count()
    loader = AsrBatchLoader(dataset, batch_size, shuffle=False, drop_last=False,
                            num_workers=num_workers,
                            shard_id=jax.process_index(), num_shards=nproc,
                            audio_pad_align=audio_pad_align)
    truths, preds = [], []
    total_loss, n_loss = 0.0, 0
    loss_fn = trainer.eval_loss_fn() if eval_loss else None
    for i, batch in enumerate(loader.epoch(0)):
        n_valid = batch.pop("n_valid")
        mb = {k: v.reshape((-1,) + v.shape[2:]) for k, v in batch.items()}
        batch_preds = decode_batch(trainer, state, mb, tokenizer, max_consec,
                                   beam_size, lm=lm)
        batch_truths = tokenizer.decode(
            [mb["labels"][b, : mb["label_len"][b]].tolist()
             for b in range(len(batch_preds))]
        )
        # drop tail-padding duplicates (loader pads partial groups; this
        # host's share of microbatch a is n_valid[a] / nproc rounded by slot)
        micro = mb["labels"].shape[0] // len(n_valid)
        keep = []
        for a, nv in enumerate(np.asarray(n_valid)):
            local_valid = min(max(int(nv) - jax.process_index() * micro, 0), micro) \
                if nproc > 1 else int(nv)
            keep += [a * micro + j for j in range(local_valid)]
        preds += [batch_preds[j] for j in keep]
        truths += [batch_truths[j] for j in keep]
        if eval_loss:
            total_loss += float(loss_fn(state, jax.tree.map(jnp.asarray, mb)))
            n_loss += 1
        if verbose:
            print("Groundtruths:\n", batch_truths)
            print("Predictions:\n", batch_preds)
        if eval_steps and i + 1 >= eval_steps:
            break
    mean_loss = total_loss / n_loss if n_loss else None
    if nproc > 1:
        truths = gather_strings(truths)
        preds = gather_strings(preds)
    return wer(truths, preds), truths, preds, mean_loss


def gather_strings(strings):
    """All-gather a list of strings across processes (multi-host WER; the
    reference's torch.distributed.all_gather_object, model.py:465-466)."""
    from jax.experimental import multihost_utils

    blob = np.frombuffer("\x1e".join(strings).encode(), np.uint8)
    n = np.asarray([blob.size], np.int64)
    sizes = np.asarray(multihost_utils.process_allgather(n)).reshape(-1)
    pad = int(sizes.max()) if sizes.size else 0
    padded = np.zeros((pad,), np.uint8)
    padded[: blob.size] = blob
    gathered = np.asarray(multihost_utils.process_allgather(padded))
    out = []
    for p in range(gathered.shape[0]):
        raw = gathered[p, : int(sizes[p])].tobytes().decode()
        if raw:
            out += raw.split("\x1e")
    return out


def run(args):
    # Multi-host: one process per host, same program; the data mesh spans all
    # hosts (reference's multi-node story was single-node-only DDP spawn).
    if os.environ.get("ECF_MULTIHOST") == "1":
        jax.distributed.initialize()

    config = load_config(args.config_file)
    for axis in ("model_parallel", "seq_parallel"):
        if getattr(args, axis, None):
            config.training_params[axis] = getattr(args, axis)
    tokenizer = None

    if args.create_tokenizer:
        from efficientconformer_tpu.data.preparation import create_tokenizer
        print("Creating Tokenizer")
        tokenizer = create_tokenizer(config.training_params, config.tokenizer_params)
    if tokenizer is None:
        tokenizer = load_tokenizer(config)

    if args.prepare_dataset:
        from efficientconformer_tpu.data.preparation import prepare_dataset
        print("Preparing dataset")
        prepare_dataset(config.training_params, config.tokenizer_params, tokenizer)

    trainer = Trainer(config)
    state = trainer.init_state(example_microbatch(config))
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(state.params))
    print(config.model_name)
    print("Model Parameters :", n)
    if args.show_dict:
        for path, p in jax.tree_util.tree_leaves_with_path(state.params):
            name = "/".join(str(k.key) for k in path)
            print(f"{name:<64} {str(tuple(p.shape)):<16} "
                  f"mean {float(jnp.mean(p)):<12.4f} std {float(jnp.std(p)):<12.4f}")

    cb_path = config.training_params.get("callback_path", "callbacks/")
    if args.initial_epoch is not None:
        state = checkpoint.load(
            os.path.join(cb_path, f"checkpoints_{args.initial_epoch}.ckpt"), state
        )
        initial_epoch = int(args.initial_epoch)
    else:
        initial_epoch = 0
    if args.initial_epoch_encoder is not None:
        enc_path = config.training_params.get("callback_path_encoder", cb_path)
        state = checkpoint.load_encoder(
            os.path.join(enc_path, f"checkpoints_{args.initial_epoch_encoder}.ckpt"),
            state,
        )

    # Shallow-fusion LM (reference main.py:69-79)
    lm = None
    if args.initial_epoch_lm:
        lm = load_lm_for_fusion(config, args.initial_epoch_lm)

    mode_base = args.mode.split("-")[0]
    tp = config.training_params

    # --seq_parallel: align every bucket's static pad length so the WHOLE
    # encoder frame schedule divides the seq axis (full SP coverage; see
    # parallel.mesh.sp_pad_align). Computed once and applied to BOTH the
    # training and evaluation loaders — an unaligned eval batch would
    # silently degrade SP to DP (ADVICE r4).
    sp_pad = None
    if tp.get("seq_parallel", 1) > 1:
        from efficientconformer_tpu.parallel.mesh import sp_pad_align

        sp_pad = sp_pad_align(config.encoder_params, tp["seq_parallel"])

    def make_eval_dataset():
        split = EVAL_SPLITS.get(args.mode, "dev-clean")
        return LibriSpeechDataset(
            tp["evaluation_dataset_path"], split,
            vocab_type=config.tokenizer_params["vocab_type"],
            vocab_size=config.vocab_size,
            audio_max_length=tp.get("eval_audio_max_length"),
            label_max_length=tp.get("eval_label_max_length"),
            lm_mode=bool(tp.get("lm_mode")),
        )

    if args.swa:
        epochs = (
            [int(e) for e in args.swa_epochs_list]
            if args.swa_epochs_list
            else list(range(int(args.swa_epochs[0]), int(args.swa_epochs[1]) + 1))
        )
        states = [
            checkpoint.load(os.path.join(cb_path, f"checkpoints_{e}.ckpt"), state)
            for e in epochs
        ]
        avg = (
            checkpoint.swa_average(states)
            if args.swa_type == "equal"
            else checkpoint.swa_exp_average(states)
        )
        # BN statistics refresh over training data (reference model.py:534-557)
        train_ds = LibriSpeechDataset(
            tp["training_dataset_path"], "train",
            vocab_type=config.tokenizer_params["vocab_type"],
            vocab_size=config.vocab_size,
            audio_max_length=tp.get("train_audio_max_length"),
            label_max_length=tp.get("train_label_max_length"),
        )
        avg = bn_refresh(trainer, avg, train_ds, steps=args.steps_per_epoch or 100)
        tag = f"swa-{args.swa_type}-{epochs[0]}-{epochs[-1]}"
        trainer.save(avg, os.path.join(cb_path, f"checkpoints_{tag}.ckpt"),
                     save_optimizer=False)
        return 0

    if mode_base == "training":
        if tp.get("training_dataset") == "LibriSpeechCorpus":
            # LM training on the 40M-line text corpus (reference §3.4:
            # functions.py:105-117, datasets.py:64-82)
            from efficientconformer_tpu.data.datasets import LibriSpeechCorpusDataset
            from efficientconformer_tpu.data.loader import LmBatchLoader

            corpus = LibriSpeechCorpusDataset(
                tp["training_dataset_path"], tokenizer,
                max_len=tp.get("train_label_max_length"),
            )
            loader = LmBatchLoader(
                corpus, tp["batch_size"],
                max_len=tp.get("train_label_max_length") or 100,
                accum_steps=tp.get("accumulated_steps", 1),
            )
        else:
            train_ds = LibriSpeechDataset(
                tp["training_dataset_path"], TRAIN_SPLITS.get(args.mode, "train"),
                vocab_type=config.tokenizer_params["vocab_type"],
                vocab_size=config.vocab_size,
                audio_max_length=tp.get("train_audio_max_length"),
                label_max_length=tp.get("train_label_max_length"),
            )
            loader = AsrBatchLoader(
                train_ds, tp["batch_size"],
                accum_steps=tp.get("accumulated_steps", 1),
                num_workers=args.num_workers,
                shard_id=jax.process_index(),
                num_shards=jax.process_count(),
                audio_pad_align=sp_pad,
            )
        writer = None
        try:
            from tensorboardX import SummaryWriter
            writer = SummaryWriter(os.path.join(cb_path, "logs"))
        except ImportError:
            pass

        class EpochIter:
            def __init__(self):
                self.epoch = initial_epoch
            def __iter__(self):
                it = loader.epoch(self.epoch)
                self.epoch += 1
                return it

        val_fn = None
        if config.model_type == "LM":
            try:
                val_ds = make_eval_dataset()  # lm_mode labels-only transcripts

                def val_fn(st):
                    vloss = evaluate_lm(
                        trainer, st, val_ds,
                        batch_size=args.batch_size_eval,
                        eval_steps=args.val_steps,
                    )
                    return {"MeanLoss": vloss}
            except FileNotFoundError:
                pass
        elif tokenizer is not None:
            try:
                val_ds = make_eval_dataset()

                def val_fn(st):
                    w, truths, preds, vloss = evaluate(
                        trainer, st, val_ds, tokenizer,
                        batch_size=args.batch_size_eval,
                        eval_steps=args.val_steps,
                        audio_pad_align=sp_pad,
                        eval_loss=True,
                    )
                    out = {"WER": 100.0 * w}
                    if vloss is not None:
                        out["MeanLoss"] = vloss
                    if truths and preds:
                        # example prediction to TB (reference model.py:326-328)
                        out["_text"] = (
                            "GroundTruth : " + truths[0]
                            + " / Prediction : " + preds[0]
                        )
                    return out
            except FileNotFoundError:
                pass

        state = trainer.fit(
            state, EpochIter(),
            epochs=tp["epochs"],
            steps_per_epoch=args.steps_per_epoch,
            initial_epoch=initial_epoch,
            callback_path=cb_path,
            val_fn=val_fn,
            saving_period=args.saving_period,
            val_period=args.val_period,
            log_writer=writer,
        )
        return 0

    if mode_base in ("validation", "test"):
        ds = make_eval_dataset()
        if config.model_type == "LM":
            # LM evaluation on transcripts: eval loss + perplexity
            # (reference lm_mode datasets + --eval_loss, model.py:438-442)
            import math

            loss = evaluate_lm(
                trainer, state, ds,
                batch_size=args.batch_size_eval, eval_steps=args.val_steps,
            )
            print("Eval Loss : {:.4f} | Perplexity : {:.2f}".format(
                loss, math.exp(min(loss, 30.0))))
            return 0
        beam = 1 if args.gready else config.decoding_params.get("beam_size", 1)
        w, truths, preds, _ = evaluate(
            trainer, state, ds, tokenizer,
            batch_size=args.batch_size_eval, eval_steps=args.val_steps,
            verbose=args.verbose_val,
            max_consec=args.rnnt_max_consec_dec_steps or 5,
            beam_size=beam,
            eval_loss=args.eval_loss,
            lm=lm,
            num_workers=args.num_workers,
            audio_pad_align=sp_pad,
        )
        kind = "Greedy" if beam <= 1 else "Beam"
        print("{} Search WER : {:.2f}%".format(kind, 100 * w))
        return 0

    if mode_base.startswith("eval_time"):
        ds = make_eval_dataset()
        if args.profiler:
            jax.profiler.start_trace(os.path.join(cb_path, "profile"))
        t0 = time.time()
        if mode_base == "eval_time_decoder":
            # token-by-token prediction-network stepping (reference
            # model.py:676-726)
            from efficientconformer_tpu.models.transducer import Transducer as Td
            loader = AsrBatchLoader(ds, args.batch_size_eval, shuffle=False)
            variables = {"params": state.params, "batch_stats": state.batch_stats}
            model = trainer.model
            step = jax.jit(
                lambda tok, carry: model.apply(
                    variables, tok, carry, method=Td.decode_step
                )
            )
            for i, batch in enumerate(loader.epoch(0)):
                mb = {k: v.reshape((-1,) + v.shape[2:]) for k, v in batch.items()}
                bsz = mb["labels"].shape[0]
                carry = model.apply(variables, bsz, method=Td.decoder_init_carry)
                for u in range(mb["labels"].shape[1]):
                    g, carry = step(jnp.asarray(mb["labels"][:, u]), carry)
                np.asarray(g)
                if args.val_steps and i + 1 >= args.val_steps:
                    break
        elif mode_base == "eval_time_encoder":
            loader = AsrBatchLoader(ds, args.batch_size_eval, shuffle=False)
            variables = {"params": state.params, "batch_stats": state.batch_stats}
            for i, batch in enumerate(loader.epoch(0)):
                mb = {k: v.reshape((-1,) + v.shape[2:]) for k, v in batch.items()}
                out = trainer.model.apply(
                    variables, jnp.asarray(mb["audio"]),
                    jnp.asarray(mb["audio_len"]), False,
                    method=type(trainer.model).encode
                    if config_is_transducer(config) else None,
                )
                jax.block_until_ready(out)
                if args.val_steps and i + 1 >= args.val_steps:
                    break
        else:
            evaluate(trainer, state, ds, tokenizer,
                     batch_size=args.batch_size_eval, eval_steps=args.val_steps,
                     max_consec=args.rnnt_max_consec_dec_steps or 5)
        dt = time.time() - t0
        if args.profiler:
            jax.profiler.stop_trace()
            # the reference prints a top-10 op table under --profiler
            # (reference model.py:613-622); summarise the jax trace the
            # same way (utils/profiling.py parses the Chrome-trace JSON)
            from efficientconformer_tpu.utils.profiling import (
                print_trace_summary,
            )

            print_trace_summary(os.path.join(cb_path, "profile"))
        print("eval time : {:.2f}s".format(dt))
        return 0

    raise ValueError(f"unknown mode {args.mode}")


def bn_refresh(trainer: Trainer, state, dataset, steps: int = 100,
               momentum: float = 0.9):
    """Re-estimate batch statistics over training data with CUMULATIVE
    averaging, matching torch.optim.swa_utils.update_bn semantics
    (reference model.py:534-557: momentum=None resets the stats and averages
    every batch equally). Our BN layers apply a fixed momentum, so the
    per-batch statistics are recovered from the mutated running stats:
    batch = (new - m*old) / (1-m)."""
    from efficientconformer_tpu.models import factory
    from efficientconformer_tpu.training import trainer as trainer_mod

    loader = AsrBatchLoader(dataset, 8, shuffle=True)
    base_stats = state.batch_stats
    acc = None
    n = 0
    for i, batch in enumerate(loader.epoch(0)):
        mb = {k: jnp.asarray(v.reshape((-1,) + v.shape[2:])) for k, v in batch.items()}
        variables = {"params": state.params, "batch_stats": base_stats}
        _, mutated = factory.apply_model(
            trainer.model, variables, mb, True,
            rngs={"dropout": trainer_mod.train_rng(0),
                  "augment": trainer_mod.train_rng(1)},
        )
        batch_stats = jax.tree.map(
            lambda new, old: (new - momentum * old) / (1.0 - momentum),
            mutated["batch_stats"], base_stats,
        )
        if acc is None:
            acc = batch_stats
        else:
            acc = jax.tree.map(
                lambda a, bs: a + (bs - a) / (n + 1), acc, batch_stats
            )
        n += 1
        if i + 1 >= steps:
            break
    if acc is not None:
        state = state.replace(batch_stats=acc)
    return state
