"""Device-resident training data: upload each shape bucket ONCE, select
batches ON DEVICE, and run many train steps per dispatch with ``lax.scan``.

Why this exists (TPU-first data-path design): the host loop uploads a fresh
image batch every step and dispatches one XLA execution per step, so its
throughput floor is set by host->device traffic and per-dispatch latency —
not by the MXU. The render rule bounds the bucket set (h mult 16, w mult 64;
reference render_data.py:81-92) and the whole 100k-image reference dataset is
only ~1.6 GB as uint8, a fraction of one chip's HBM. So the TPU-native layout
is: park every bucket on the chip as uint8, derive the batch indices inside
the jitted step from the donated RNG/step counter (zero host inputs per
step), normalize on device (fused into the encoder by XLA), and amortize
dispatch latency by scanning ``steps_per_call`` optimizer steps in ONE
execution. The host's only per-call work is reading two scalars.

Batch selection semantics: one permutation of the bucket per (epoch, bucket)
— keyed on the dynamic ``perm_seed`` scalar the host passes (the epoch
number) — and every call of that bucket's epoch pass walks a disjoint slice
of it: call step ``start + s`` reads rows ``perm[(start+s)*B .. +B]``. The
plan assigns each call its ``start`` offset, so an epoch is exactly one
without-replacement pass over the bucket regardless of how the calls are
chunked or interleaved (chunked calls drawing FRESH permutations would
bootstrap-sample: ~1/e of the rows unseen per epoch). The host loop
(training/loop.py) interleaves buckets call-by-call, mirroring
BucketBatchSampler's epoch structure (reference dataset.py:281-326) at call
granularity. Train-time augmentation runs ON DEVICE in this mode
(``augment_batch``: random scale/translate/brightness, the stand-in for the
host PIL RandomAffine); it defaults off, like the host path.

The preprocessing here is bit-identical to the host path for grayscale
sources: ``1 - uint8/255`` in f32 (transforms.to_model_array).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import optax

from texocr_tpu.data.dataset import BOS_CHAR, EOS_CHAR, PAD_CHAR, ImageDataset
from texocr_tpu.models.ocr_model import OCRModel
from texocr_tpu.training.losses import sequence_ce_loss
from texocr_tpu.training.train_step import TrainState
from texocr_tpu.utils import pad_to_multiple


# TPU vector lane width. Resident buckets are stored with their minor
# (last) dimension padded to a multiple of this: XLA's TPU gather emits a
# zero-copy dynamic-slice loop ONLY when the operand's minor dim is
# lane-aligned — otherwise every batch gather first materializes a relayout
# copy of the ENTIRE bucket as scratch (measured: 3.77 GB temp for one
# 32-row gather from a (23040, 160, 1008) u8 bucket; 12 GB total temps in
# the scan train step → OOM on a 16 GB chip). Padding (160,1008)->(160,1024)
# costs +1.6% HBM and makes the gather's temp footprint the batch itself.
LANE = 128


class DeviceBucket:
    """One (h, w) shape bucket resident on device.

    ``images``/``labels`` are stored lane-padded (see ``LANE``); ``true_w``
    and ``true_len`` are the logical width / label length the model sees —
    gather_batch crops each gathered batch back to them.

    ``pack_bits=4`` means ``images`` holds TWO horizontally-adjacent pixels
    per byte (even pixel in the high nibble), halving residency; gather_batch
    unpacks on device. Renders are near-binary (white background, black
    glyphs, a thin antialiased edge), so 16 gray levels lose at most 15/255
    per pixel — less than the train-time brightness jitter."""

    def __init__(self, images: jax.Array, labels: jax.Array, n: int,
                 true_w: Optional[int] = None, true_len: Optional[int] = None,
                 pack_bits: int = 8):
        self.images = images  # uint8 (N, H, W_pad) or packed (N, H, W_pad/2)
        self.labels = labels  # int32 (N, L_pad) BOS/seq/EOS/PAD rows
        self.n = n
        unpacked_w = images.shape[2] * (2 if pack_bits == 4 else 1)
        self.true_w = true_w if true_w is not None else unpacked_w
        self.true_len = true_len if true_len is not None else labels.shape[1]
        self.pack_bits = pack_bits

    @property
    def shape(self) -> Tuple[int, int]:
        return self.images.shape[1], self.true_w

    @property
    def seq_len(self) -> int:
        return self.true_len


def _pack_labels(
    token_ids: List[List[int]],
    pad: int,
    bos: int,
    eos: int,
    seq_pad_multiple: int,
    min_len: Optional[int] = None,
) -> np.ndarray:
    """Rows of [BOS, seq..., EOS, PAD...] padded to the bucket max (+2),
    rounded to ``seq_pad_multiple`` — BatchCollator's layout (dataset.py)
    applied bucket-wide instead of batch-wide, so the compiled length is
    fixed per bucket."""
    max_len = max((len(s) for s in token_ids), default=0) + 2
    if min_len:
        max_len = max(max_len, min_len)
    max_len = pad_to_multiple(max_len, seq_pad_multiple)
    out = np.full((len(token_ids), max_len), pad, dtype=np.int32)
    for i, s in enumerate(token_ids):
        out[i, 0] = bos
        out[i, 1 : len(s) + 1] = s
        out[i, len(s) + 1] = eos
    return out


class DeviceResidentData:
    """Per-bucket device arrays built from an :class:`ImageDataset`."""

    def __init__(self, buckets: Dict[Tuple[int, int], DeviceBucket], max_seq_len: int):
        self.buckets = buckets
        self.max_seq_len = max_seq_len

    @classmethod
    def from_dataset(
        cls,
        ds: ImageDataset,
        seq_pad_multiple: int = 1,
        min_bucket_items: int = 1,
        device=None,
        mesh=None,
        max_canvas: Optional[Tuple[int, int]] = None,
        size_round: int = 1,
        bucket_cap: Optional[int] = None,
        pack_bits: int = 8,
    ) -> "DeviceResidentData":
        """``mesh`` replicates each bucket across the mesh's devices (the
        dataset is small relative to HBM; replication keeps the on-device
        gather local — no cross-chip collective per batch). The per-batch
        'data'-axis sharding happens after the gather (make_scan_train_step),
        so each chip materializes only its own rows.

        ``size_round`` pads each bucket's row count up to a multiple (rows
        repeated modulo the real count; ``DeviceBucket.n`` keeps the real
        count and the scan steps never sample the padding). The bucket row
        count is part of the compiled executable's input shape, so without
        rounding EVERY dataset-size change recompiles every bucket — minutes
        per shape through the remote-compile tunnel.

        ``bucket_cap`` bounds the RESIDENT rows per bucket: a bucket larger
        than the cap stages a seeded (per-bucket-key, epoch-stable) random
        subset instead of the whole bucket. This is the HBM spill knob for
        datasets whose buckets + backward activations exceed the chip — at
        the 100k typeset scale the (160,1008) bucket alone is 8.2 GB and the
        remat backward no longer fits beside it. Dropped rows are reported
        loudly (never a silent cap); the subset is deterministic so
        resume/restart trains on the same rows.

        ``pack_bits=4`` stores two pixels per byte (round-to-nearest 4-bit
        gray, unpacked on device by gather_batch) — the non-lossy-in-practice
        alternative to bucket_cap when the dataset alone overflows HBM: at
        the 100k typeset scale it keeps ALL rows resident in ~5.1 GB instead
        of dropping 30% of them."""
        if mesh is not None and device is None:
            from jax.sharding import NamedSharding, PartitionSpec

            device = NamedSharding(mesh, PartitionSpec())
        pad = ds.tokenizer.special_tokens[PAD_CHAR]
        bos = ds.tokenizer.special_tokens[BOS_CHAR]
        eos = ds.tokenizer.special_tokens[EOS_CHAR]
        buckets: Dict[Tuple[int, int], DeviceBucket] = {}
        max_seq = 0
        for (w, h), idxs in sorted(ds.sizes.items()):
            if len(idxs) < min_bucket_items:
                continue
            # Curriculum / memory knob: restrict to buckets within a canvas
            # bound, e.g. (32, 640) trains the single-line stage first.
            if max_canvas is not None and (h > max_canvas[0] or w > max_canvas[1]):
                continue
            if bucket_cap is not None and len(idxs) > bucket_cap:
                rng = np.random.default_rng(h * 1_000_003 + w)
                keep = np.sort(
                    rng.choice(len(idxs), size=bucket_cap, replace=False)
                )
                print(
                    f"  bucket ({h}, {w}): bucket_cap {bucket_cap} keeps "
                    f"{bucket_cap}/{len(idxs)} rows "
                    f"({len(idxs) - bucket_cap} dropped, seeded subset)"
                )
                idxs = [idxs[i] for i in keep]
            n = len(idxs)
            n_pad = pad_to_multiple(n, size_round)
            rows = idxs + [idxs[i % n] for i in range(n_pad - n)]
            imgs = np.stack([ds._load_array(i) for i in rows])  # (N', H, W) u8
            labs = _pack_labels(
                [ds.token_ids[i] for i in rows], pad, bos, eos, seq_pad_multiple
            )
            max_seq = max(max_seq, labs.shape[1])
            # Lane-align the minor dims in storage (images: white 255 = the
            # render background pre-inversion; labels: PAD). gather_batch
            # crops each gathered batch back to the true dims, so the model
            # never sees the padding — it exists only so the on-device
            # gather is zero-copy (see LANE).
            true_w, true_len = imgs.shape[2], labs.shape[1]
            if pack_bits == 4:
                # Round-to-nearest 4-bit gray, two pixels per byte (even
                # pixel in the high nibble). Pack BEFORE lane-padding so the
                # stored minor dim is the packed one; 0xFF padding unpacks
                # to the white background.
                if imgs.shape[2] % 2:
                    imgs = np.pad(imgs, ((0, 0), (0, 0), (0, 1)),
                                  constant_values=255)
                q = np.minimum((imgs.astype(np.uint16) + 8) >> 4, 15)
                imgs = ((q[:, :, 0::2] << 4) | q[:, :, 1::2]).astype(np.uint8)
                pad_val = 0xFF
            else:
                pad_val = 255
            w_pad = pad_to_multiple(imgs.shape[2], LANE) - imgs.shape[2]
            if w_pad:
                imgs = np.pad(imgs, ((0, 0), (0, 0), (0, w_pad)),
                              constant_values=pad_val)
            l_pad = pad_to_multiple(true_len, LANE) - true_len
            if l_pad:
                labs = np.pad(labs, ((0, 0), (0, l_pad)), constant_values=pad)
            buckets[(h, w)] = DeviceBucket(
                jax.device_put(jnp.asarray(imgs), device),
                jax.device_put(jnp.asarray(labs), device),
                n,
                true_w=true_w,
                true_len=true_len,
                pack_bits=pack_bits,
            )
        return cls(buckets, max_seq)

    def plan(
        self, batch_size: int, steps_cap: int = 32
    ) -> List[Tuple[Tuple[int, int], int, int]]:
        """One epoch as a list of (bucket_key, steps, start) dispatches. Each
        call scans up to ``steps_cap`` steps beginning at batch offset
        ``start`` of the bucket's per-epoch permutation, so ``sum(steps)``
        per bucket is one full without-replacement pass (floor(n / batch),
        min 1 so small buckets still train)."""
        out = []
        for key, b in self.buckets.items():
            total = max(b.n // batch_size, 1)
            start = 0
            while total > 0:
                take = min(total, steps_cap)
                out.append((key, take, start))
                total -= take
                start += take
        return out


def gather_batch(
    images_u8: jax.Array,
    labels: jax.Array,
    idx: jax.Array,
    crop_w: Optional[int] = None,
    crop_len: Optional[int] = None,
    pack_bits: int = 8,
) -> Tuple[jax.Array, jax.Array]:
    """On-device batch materialization: gather rows (zero-copy against the
    lane-padded bucket, see ``LANE``), unpack 4-bit storage if the bucket is
    packed (a few VPU ops on the BATCH only), crop the BATCH back to the
    logical dims (static slice of batch-sized arrays — cheap), then the host
    collator's arithmetic (transforms.to_model_array): f32 /255, invert,
    add channel."""
    imgs = jnp.take(images_u8, idx, axis=0)
    labs = jnp.take(labels, idx, axis=0)
    if pack_bits == 4:
        # x17 maps the 4-bit code back onto 0..255 exactly at the endpoints
        # (15*17 = 255: background/ink are lossless; edge grays within 15).
        hi = (imgs >> 4) * jnp.uint8(17)
        lo = (imgs & jnp.uint8(0xF)) * jnp.uint8(17)
        b, h2, wp = imgs.shape
        imgs = jnp.stack([hi, lo], axis=-1).reshape(b, h2, 2 * wp)
    if crop_w is not None and crop_w != imgs.shape[2]:
        imgs = imgs[:, :, :crop_w]
    if crop_len is not None and crop_len != labs.shape[1]:
        labs = labs[:, :crop_len]
    imgs = imgs.astype(jnp.float32) / 255.0
    return (1.0 - imgs)[..., None], labs


def augment_batch(images: jax.Array, key: jax.Array) -> jax.Array:
    """On-device train-time augmentation — the TPU-native stand-in for the
    host PIL RandomAffine (transforms.affine_scale_aug; reference
    dataset.py:365-371): per-sample random scale 0.85-1.05 about the center
    (the reference's range) plus a small random translation and brightness
    jitter. Runs in ink space (0 = background) AFTER inversion, so
    out-of-bounds resample fills with 0 = white background — the same fill
    the reference uses pre-inversion. A few fused elementwise/resample ops
    per step; XLA overlaps them with the encoder."""
    b, h, w, _ = images.shape
    k1, k2, k3, k4 = jax.random.split(key, 4)
    scale = jax.random.uniform(k1, (b,), minval=0.85, maxval=1.05)
    dy = jax.random.uniform(k2, (b,), minval=-3.0, maxval=3.0)
    dx = jax.random.uniform(k3, (b,), minval=-8.0, maxval=8.0)

    def one(img, s, ty, tx):
        # scale about the image center, then shift by (ty, tx)
        trans = jnp.stack([(1.0 - s) * h * 0.5 + ty, (1.0 - s) * w * 0.5 + tx])
        return jax.image.scale_and_translate(
            img, (h, w, 1), (0, 1), jnp.stack([s, s]), trans, method="linear"
        )

    out = jax.vmap(one)(images, scale, dy, dx)
    bright = jax.random.uniform(k4, (b, 1, 1, 1), minval=0.9, maxval=1.1)
    return jnp.clip(out * bright, 0.0, 1.0)


def make_scan_train_step(
    model: OCRModel,
    tx: optax.GradientTransformation,
    batch_size: int,
    *,
    mask_pad: bool = True,
    mesh=None,
    augment: bool = False,
    steps_cap: int = 16,
):
    """(state, bucket_images, bucket_labels, n_steps, n_real, start,
    perm_seed) -> (state, metrics).

    Runs ``n_steps`` full optimizer steps in ONE compiled execution. Batch
    rows come from an on-device permutation keyed on ``perm_seed`` (the host
    passes the epoch number, so every call of a bucket's epoch pass shares
    ONE permutation): call step s reads rows ``perm[((start+s)*B + j) % n]``,
    with ``start`` the call's batch offset from plan(). The only host traffic
    is the two scalar metric means on readback. The scan length is the static
    ``steps_cap``; ``n_steps``/``start``/``perm_seed`` are DYNAMIC scalars —
    trailing iterations fall into a ``lax.cond`` pass-through branch (state
    unchanged, no fwd/bwd executed on TPU), so there is exactly ONE
    executable per bucket shape instead of one per (shape, n_steps) pair.
    At the full-canvas regime each extra executable costs minutes of XLA
    compile; remainder chunks made that a per-config tax.
    """
    pad_token = model.config.pad_token
    batch_spec = None
    if mesh is not None:
        from texocr_tpu.parallel.sharding import batch_sharding

        batch_spec = batch_sharding(mesh)

    @partial(jax.jit, donate_argnums=(0,), static_argnums=(8, 9, 10))
    def run(state: TrainState, images_u8, labels_all, n_steps, n_real,
            start=0, perm_seed=0, bucket_tag=0, crop_w=None, crop_len=None,
            pack_bits=8):
        n_padded = images_u8.shape[0]
        # Selection keys diverge from dropout keys via a tag fold so the two
        # streams never collide (dropout folds (rng, step) directly). The key
        # depends on (perm_seed, bucket_tag) — NOT the entry step counter —
        # so chunked calls of one epoch pass share one permutation (their
        # disjoint ``start`` slices cover the bucket exactly once) while
        # same-sized buckets don't replay identical orderings.
        perm_key = jax.random.fold_in(
            jax.random.fold_in(
                jax.random.fold_in(state.dropout_rng, perm_seed), bucket_tag
            ),
            0x5E1EC7,
        )
        # Random order of the REAL rows as argsort of iid uniforms with the
        # padding rows pushed to the back: ``n_real`` stays a dynamic scalar
        # (jax.random.permutation would need a static size, re-tying the
        # executable to the dataset size that bucket padding just decoupled).
        scores = jnp.where(
            jnp.arange(n_padded) < n_real,
            jax.random.uniform(perm_key, (n_padded,)),
            jnp.inf,
        )
        perm = jnp.argsort(scores)

        def do_step(state, s):
            idx = jnp.take(
                perm, ((start + s) * batch_size + jnp.arange(batch_size))
                % n_real
            )
            images, labels = gather_batch(
                images_u8, labels_all, idx, crop_w, crop_len, pack_bits
            )
            if batch_spec is not None:
                images = jax.lax.with_sharding_constraint(images, batch_spec)
                labels = jax.lax.with_sharding_constraint(labels, batch_spec)
            step_rng = jax.random.fold_in(state.dropout_rng, state.step)
            if augment:
                aug_key = jax.random.fold_in(step_rng, 0xA06)
                images = augment_batch(images, aug_key)

            def loss_fn(params):
                logits, shifted = model.apply(
                    {"params": params},
                    images,
                    labels,
                    deterministic=False,
                    rngs={"dropout": step_rng},
                )
                loss = sequence_ce_loss(
                    logits, shifted, pad_token=pad_token, mask_pad=mask_pad
                )
                acc_mask = (
                    (shifted != pad_token)
                    if mask_pad
                    else jnp.ones_like(shifted, jnp.bool_)
                )
                acc = jnp.sum(
                    (jnp.argmax(logits, -1) == shifted) & acc_mask
                ) / jnp.maximum(jnp.sum(acc_mask), 1)
                return loss, acc

            (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params
            )
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            return (
                TrainState(
                    step=state.step + 1,
                    params=params,
                    opt_state=opt_state,
                    dropout_rng=state.dropout_rng,
                ),
                (loss, acc, jnp.float32(1)),
            )

        def body(state, s):
            return jax.lax.cond(
                s < n_steps,
                do_step,
                lambda state, s: (state, (jnp.float32(0), jnp.float32(0),
                                          jnp.float32(0))),
                state,
                s,
            )

        state, (losses, accs, took) = jax.lax.scan(
            body, state, jnp.arange(steps_cap), length=steps_cap
        )
        denom = jnp.maximum(jnp.sum(took), 1.0)
        return state, {
            "loss": jnp.sum(losses) / denom,
            "token_acc": jnp.sum(accs) / denom,
        }

    return run


def make_scan_eval_step(
    model: OCRModel, batch_size: int, *, mask_pad: bool = True,
    steps_cap: int = 16,
):
    """(params, bucket_images, bucket_labels, n_steps, start) -> mean loss
    over ``n_steps`` deterministic batches walking the bucket in storage
    order from batch offset ``start``. Like the train step, the scan length
    is the static ``steps_cap`` and ``n_steps``/``start`` are dynamic, so
    each bucket shape compiles once; callers chunk a full pass into
    ``ceil(total / steps_cap)`` calls."""
    pad_token = model.config.pad_token

    @partial(jax.jit, static_argnums=(6, 7, 8))
    def run(params, images_u8, labels_all, n_steps, start, n_real,
            crop_w=None, crop_len=None, pack_bits=8):
        def do_batch(acc, s):
            idx = ((start + s) * batch_size + jnp.arange(batch_size)) % n_real
            images, labels = gather_batch(
                images_u8, labels_all, idx, crop_w, crop_len, pack_bits
            )
            logits, shifted = model.apply({"params": params}, images, labels)
            return acc + sequence_ce_loss(
                logits, shifted, pad_token=pad_token, mask_pad=mask_pad
            )

        def body(acc, s):
            return (
                jax.lax.cond(s < n_steps, do_batch, lambda acc, s: acc, acc, s),
                None,
            )

        total, _ = jax.lax.scan(
            body, jnp.zeros((), jnp.float32), jnp.arange(steps_cap)
        )
        return total / jnp.maximum(n_steps, 1)

    return run
