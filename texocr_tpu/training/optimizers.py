"""Optimizer registry — config-name driven, like the reference's reflection
on torch.optim (reference utils.py:41-46), but over optax."""

from __future__ import annotations

import optax


def get_optimizer(name: str, args: dict) -> optax.GradientTransformation:
    """'Adam'/'AdamW'/'SGD' + torch-style kwargs -> optax transformation.

    torch Adam's weight_decay is L2 added to the gradient pre-moment
    (coupled); optax.add_decayed_weights before adam reproduces that.

    ``lr_schedule``: optional dict ``{"warmup_steps": W, "decay_steps": D,
    "end_value": E}`` turning the scalar ``lr`` into a linear-warmup +
    cosine-decay schedule peaking at ``lr`` (held at E past W+D). The
    reference has no schedule (constant Adam, train.py:54/config.yml:26-29);
    this is the standard transformer-training knob it lacks.

    ``grad_clip``: optional global-norm clip applied before the optimizer
    update. Warm-starting a converged checkpoint under a fresh high-LR
    cosine schedule can take one large step off the sharpened loss surface
    (observed once: stage G epoch 7, train CE 0.011 -> 0.470 -> recovered;
    RESULTS.md); clipping bounds that excursion.
    """
    args = dict(args)
    lr = args.pop("lr", 1e-3)
    grad_clip = args.pop("grad_clip", None)
    sched = args.pop("lr_schedule", None)
    if sched:
        lr = optax.warmup_cosine_decay_schedule(
            init_value=0.0,
            peak_value=lr,
            warmup_steps=int(sched.get("warmup_steps", 0)),
            decay_steps=int(sched["decay_steps"]),
            end_value=float(sched.get("end_value", 0.0)),
        )
    weight_decay = args.pop("weight_decay", 0.0)
    betas = args.pop("betas", (0.9, 0.999))
    eps = args.pop("eps", 1e-8)
    name = name.lower()

    def finish(*transforms):
        chain = list(transforms)
        if grad_clip:
            chain.insert(0, optax.clip_by_global_norm(float(grad_clip)))
        return optax.chain(*chain)

    if name == "adam":
        core = optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=eps)
        chain = [core]
        if weight_decay:
            chain.insert(0, optax.add_decayed_weights(weight_decay))
        chain.append(optax.scale_by_learning_rate(lr))
        return finish(*chain)
    if name == "adamw":
        return finish(optax.adamw(
            lr, b1=betas[0], b2=betas[1], eps=eps, weight_decay=weight_decay
        ))
    if name == "sgd":
        momentum = args.pop("momentum", 0.0)
        chain = []
        if weight_decay:
            chain.append(optax.add_decayed_weights(weight_decay))
        chain.append(optax.sgd(lr, momentum=momentum or None))
        return finish(*chain)
    raise ValueError(f"unknown optimizer: {name!r}")
