"""Dump golden test fixtures from the PyTorch reference into tests/golden/.

Run once (offline) against the read-only reference checkout:

    python tools/make_goldens.py --reference /root/reference --out tests/golden

This captures the reference's *behavior* (inputs → outputs at fixed weights)
as .npz fixtures so the JAX rebuild can be parity-tested without torch or the
reference present. No reference code is vendored — the fixtures are data.

Parity is defined on the math at identical weights/inputs, not on RNG streams
(PyTorch and JAX PRNGs are incompatible; SURVEY.md §7 "hard parts" #2).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np
import torch


def t2n(x):
    return x.detach().cpu().numpy()


def dump(out_dir, name, **arrays):
    path = os.path.join(out_dir, f"{name}.npz")
    np.savez_compressed(path, **arrays)
    print(f"wrote {path}: {list(arrays)[:8]}{'...' if len(arrays) > 8 else ''}")


def make_mp_ops(ref, out_dir, rng):
    from src import utils as rutils

    x = torch.tensor(rng.standard_normal((4, 7, 24)), dtype=torch.float32)
    a = torch.tensor(rng.standard_normal((4, 7, 24)), dtype=torch.float32)
    shift = torch.tensor(rng.standard_normal((4, 24)), dtype=torch.float32)
    scale = torch.tensor(rng.standard_normal((4, 24)), dtype=torch.float32)
    w = torch.tensor(rng.standard_normal((18, 10)), dtype=torch.float32)
    img = torch.tensor(rng.standard_normal((2, 4, 16, 16)), dtype=torch.float32)

    tens_t = torch.tensor(0.37)
    dump(
        out_dir,
        "mp_ops",
        x=t2n(x),
        a=t2n(a),
        shift=t2n(shift),
        scale=t2n(scale),
        w=t2n(w),
        img=t2n(img),
        magnitude=t2n(rutils.magnitude(x)),
        mp_sum_03=t2n(rutils.mp_sum(x, a, t=0.3)),
        mp_sum_05=t2n(rutils.mp_sum(x, a, t=0.5)),
        mp_sum_tensor_t=t2n(rutils.mp_sum(x, a, t=tens_t)),
        tensor_t=t2n(tens_t),
        modulate_0=t2n(rutils.modulate(x, shift, scale, t=0.0)),
        modulate_tensor=t2n(rutils.modulate(x, shift, scale, t=tens_t)),
        normalize_x=t2n(rutils.normalize(x)),
        normalize_w=t2n(rutils.normalize(w)),
        chunk_normalize_w3=t2n(rutils.chunk_normalize(w, 3)),
        patchify_p2=t2n(rutils.patchify(img, 2)),
        patchify_p4=t2n(rutils.patchify(img, 4)),
        unpatchify_roundtrip=t2n(
            rutils.unpatchify(rutils.patchify(img, 2), 16, 2)
        ),
    )

    from src.pos_embed import get_2d_sincos_pos_embed

    dump(
        out_dir,
        "pos_embed",
        table_256_8=get_2d_sincos_pos_embed(256, 8),
        table_384_8=get_2d_sincos_pos_embed(384, 8),
        table_64_4=get_2d_sincos_pos_embed(64, 4),
    )


def make_model(ref, out_dir, rng):
    from src.models import DIT_MODELS

    torch.manual_seed(0)
    model = DIT_MODELS["DiT-XS/2"](in_channels=4, input_size=16, num_classes=10)
    model.eval()

    sd = {k: t2n(v) for k, v in model.state_dict().items()}

    x = torch.tensor(rng.standard_normal((3, 4, 16, 16)), dtype=torch.float32)
    t = torch.tensor([0, 500, 999], dtype=torch.float32)
    y = torch.tensor([1, 5, 10])  # 10 = null class row

    with torch.no_grad():
        out = model(x, t, y)
        # CFG path: first half duplicated; batch must be even
        x_cfg = torch.cat([x[:2], x[:2]], dim=0)
        t_cfg = torch.tensor([10.0, 20.0, 10.0, 20.0])
        y_cfg = torch.tensor([1, 5, 10, 10])
        out_cfg = model.forward_with_cfg(x_cfg, t_cfg, y_cfg, cfg_scale=4.0)

    arrays = {f"sd.{k}": v for k, v in sd.items()}
    dump(
        out_dir,
        "dit_xs2",
        x=t2n(x),
        t=t2n(t),
        y=t2n(y),
        out=t2n(out),
        x_cfg=t2n(x_cfg),
        t_cfg=t2n(t_cfg),
        y_cfg=t2n(y_cfg),
        out_cfg=t2n(out_cfg),
        **arrays,
    )

    # Per-module goldens for localized debugging, same trunk of weights.
    blk = model.blocks[0]
    xt = torch.tensor(rng.standard_normal((3, 64, 256)), dtype=torch.float32)
    c = torch.tensor(rng.standard_normal((3, 256)), dtype=torch.float32)
    with torch.no_grad():
        attn_out = blk.attn(xt)
        mlp_out = blk.mlp(xt)
        blk_out = blk(xt, c)
        fin_mean, fin_sigma = model.final_layer(xt, c)
        temb = model.t_embedder(torch.tensor([0.0, 13.0, 999.0]))
    dump(
        out_dir,
        "dit_xs2_modules",
        xt=t2n(xt),
        c=t2n(c),
        attn_out=t2n(attn_out),
        mlp_out=t2n(mlp_out),
        blk_out=t2n(blk_out),
        fin_mean=t2n(fin_mean),
        fin_sigma=t2n(fin_sigma),
        temb=t2n(temb),
    )


def make_diffusion(ref, out_dir, rng):
    from diffusion import create_diffusion, gaussian_diffusion as gd
    from diffusion.respace import space_timesteps

    diff = create_diffusion("")  # full 1000, MSE, EPSILON, LEARNED_RANGE
    d250 = create_diffusion("250")
    dddim = create_diffusion("ddim25")

    x0 = torch.tensor(rng.standard_normal((4, 4, 8, 8)), dtype=torch.float32)
    noise = torch.tensor(rng.standard_normal((4, 4, 8, 8)), dtype=torch.float32)
    t = torch.tensor([0, 250, 999, 42])
    xt = diff.q_sample(x0, t, noise=noise)

    # Synthetic model output (B, 2C, H, W): eps-hat + var values in [-1, 1]
    eps_hat = torch.tensor(rng.standard_normal((4, 4, 8, 8)), dtype=torch.float32)
    var_v = torch.tanh(
        torch.tensor(rng.standard_normal((4, 4, 8, 8)), dtype=torch.float32)
    )
    model_out = torch.cat([eps_hat, var_v], dim=1)
    fixed_model = lambda *a, **k: model_out

    with torch.no_grad():
        pmv = diff.p_mean_variance(fixed_model, xt, t, clip_denoised=False)
        pmv_clip = diff.p_mean_variance(fixed_model, xt, t, clip_denoised=True)
        losses = diff.training_losses(fixed_model, x0, t, noise=noise)
        # respaced p_mean_variance exercises the timestep_map remap
        t_sub = torch.tensor([0, 100, 249, 42])
        pmv_250 = d250.p_mean_variance(fixed_model, xt, t_sub, clip_denoised=False)

    dump(
        out_dir,
        "diffusion",
        betas=diff.betas,
        alphas_cumprod=diff.alphas_cumprod,
        alphas_cumprod_prev=diff.alphas_cumprod_prev,
        sqrt_alphas_cumprod=diff.sqrt_alphas_cumprod,
        sqrt_one_minus_alphas_cumprod=diff.sqrt_one_minus_alphas_cumprod,
        sqrt_recip_alphas_cumprod=diff.sqrt_recip_alphas_cumprod,
        sqrt_recipm1_alphas_cumprod=diff.sqrt_recipm1_alphas_cumprod,
        posterior_variance=diff.posterior_variance,
        posterior_log_variance_clipped=diff.posterior_log_variance_clipped,
        posterior_mean_coef1=diff.posterior_mean_coef1,
        posterior_mean_coef2=diff.posterior_mean_coef2,
        betas_250=d250.betas,
        timestep_map_250=np.array(d250.timestep_map),
        betas_ddim25=dddim.betas,
        timestep_map_ddim25=np.array(dddim.timestep_map),
        space_250=np.array(sorted(space_timesteps(1000, "250"))),
        space_ddim25=np.array(sorted(space_timesteps(1000, "ddim25"))),
        cosine_betas=gd.get_named_beta_schedule("squaredcos_cap_v2", 1000),
        x0=t2n(x0),
        noise=t2n(noise),
        t=t2n(t),
        t_sub=t2n(t_sub),
        xt=t2n(xt),
        model_out=t2n(model_out),
        pmv_mean=t2n(pmv["mean"]),
        pmv_var=t2n(pmv["variance"]),
        pmv_logvar=t2n(pmv["log_variance"]),
        pmv_xstart=t2n(pmv["pred_xstart"]),
        pmv_clip_mean=t2n(pmv_clip["mean"]),
        pmv_clip_xstart=t2n(pmv_clip["pred_xstart"]),
        pmv250_mean=t2n(pmv_250["mean"]),
        pmv250_logvar=t2n(pmv_250["log_variance"]),
        loss_mse=t2n(losses["mse"]),
        loss_vb=t2n(losses["vb"]),
        loss=t2n(losses["loss"]),
    )


def make_sampler_chains(ref, out_dir, rng):
    """Full denoising-chain goldens with a deterministic pseudo-model.

    DDPM uses injected deterministic per-step noise (noise[b,c,h,w] =
    cos(flat_index*0.01 + t)); DDIM eta=0 is noise-free. These validate the
    entire p_sample/ddim_sample chain math across frameworks without RNG.
    """
    from diffusion import create_diffusion

    def fixed_model(x, t, **kw):
        return torch.cat([0.1 * x, torch.tanh(x)], dim=1)

    shape = (2, 4, 8, 8)
    start = torch.tensor(rng.standard_normal(shape), dtype=torch.float32)

    def det_noise(x, t_val):
        idx = torch.arange(x.numel(), dtype=torch.float32).reshape(x.shape)
        return torch.cos(idx * 0.01 + float(t_val))

    # DDPM, 10 respaced steps, manual loop with injected noise
    d10 = create_diffusion("10")
    x = start.clone()
    with torch.no_grad():
        for i in reversed(range(d10.num_timesteps)):
            t = torch.full((shape[0],), i, dtype=torch.long)
            out = d10.p_mean_variance(
                d10._wrap_model(fixed_model), x, t, clip_denoised=True
            )
            nonzero = (t != 0).float().view(-1, 1, 1, 1)
            x = out["mean"] + nonzero * torch.exp(0.5 * out["log_variance"]) * det_noise(x, i)
    ddpm_final = x

    # DDIM eta=0, 10 steps — fully deterministic
    dd = create_diffusion("ddim10")
    with torch.no_grad():
        x = start.clone()
        for i in reversed(range(dd.num_timesteps)):
            t = torch.full((shape[0],), i, dtype=torch.long)
            x = dd.ddim_sample(fixed_model, x, t, clip_denoised=True, eta=0.0)["sample"]
    ddim_final = x

    dump(
        out_dir,
        "sampler_chains",
        start=t2n(start),
        ddpm_final=t2n(ddpm_final),
        ddim_final=t2n(ddim_final),
    )


def make_e2e_sample(ref, out_dir, rng):
    """End-to-end sample-parity golden: the real DiT-XS/2 (same weights as
    the dit_xs2 fixture — torch.manual_seed(0) init) driven through the
    reference's respaced CFG p_sample chain (`sample.py:52-61` composition:
    p_sample_loop over forward_with_cfg through SpacedDiffusion) for 10
    steps with deterministic injected step noise. clip_denoised=True keeps
    an untrained model's chain finite; the clip math itself is part of the
    p_mean_variance goldens either way.
    """
    from diffusion import create_diffusion
    from src.models import DIT_MODELS

    torch.manual_seed(0)
    model = DIT_MODELS["DiT-XS/2"](in_channels=4, input_size=16, num_classes=10)
    model.eval()

    n = 2
    z = torch.tensor(rng.standard_normal((n, 4, 16, 16)), dtype=torch.float32)
    z_cfg = torch.cat([z, z], dim=0)
    y_cfg = torch.tensor([1, 5, 10, 10])  # [cond; null]
    cfg_scale = 4.0

    def det_noise(x, t_val):
        idx = torch.arange(x.numel(), dtype=torch.float32).reshape(x.shape)
        return torch.cos(idx * 0.01 + float(t_val))

    d10 = create_diffusion("10")
    wrapped = d10._wrap_model(
        lambda x, t, **kw: model.forward_with_cfg(x, t, kw["y"], cfg_scale)
    )
    x = z_cfg.clone()
    traj = []
    with torch.no_grad():
        # p_sample_loop internals (gd.py:490-511) with injected step noise
        for i in reversed(range(d10.num_timesteps)):
            t = torch.full((x.shape[0],), i, dtype=torch.long)
            out = d10.p_mean_variance(wrapped, x, t, clip_denoised=True,
                                      model_kwargs={"y": y_cfg})
            nonzero = (t != 0).float().view(-1, 1, 1, 1)
            x = out["mean"] + nonzero * torch.exp(0.5 * out["log_variance"]) * det_noise(x, i)
            traj.append(t2n(x))

    dump(
        out_dir,
        "e2e_sample",
        z_cfg=t2n(z_cfg),
        y_cfg=t2n(y_cfg),
        cfg_scale=np.float32(cfg_scale),
        final=t2n(x),
        traj=np.stack(traj),
    )


def make_ema(ref, out_dir, rng):
    from src import ema as rema

    stds = np.array([0.0075, 0.01, 0.05, 0.1, 0.15])
    gammas = rema.std_to_gamma(stds)
    ts = np.arange(1, 11) * 1000
    in_stds = np.array([0.05, 0.1] * 5)
    in_gammas = rema.std_to_gamma(in_stds)
    weights = rema.solve_weights(
        ts.astype(np.float64), in_gammas, np.array([10000.0]), rema.std_to_gamma(0.07)
    )
    dump(
        out_dir,
        "ema_math",
        stds=stds,
        gammas=gammas,
        roundtrip=rema.gamma_to_std(gammas),
        beta_005=rema.calc_beta(0.05, np.arange(1, 2001)),
        beta_01=rema.calc_beta(0.1, np.arange(1, 2001)),
        solve_ts=ts.astype(np.float64),
        solve_in_stds=in_stds,
        solve_weights=weights,
    )


def make_gradient_golden(ref, out_dir, rng):
    """Full training-loss backward through the MP model at fixed weights.

    Captures d(loss)/d(param) for representative parameters — validates the
    rebuilt backward pass end to end, including the learned-gain
    stop-gradient semantics (the coerced math.sqrt denominator,
    src/utils.py:15-16) and the frozen-mean VB term (gd.py:758-765).
    Model in eval() so no forced-WN mutation and no label dropout; grads are
    well-defined either way.
    """
    import sys

    from diffusion import create_diffusion
    from src.models import DIT_MODELS

    torch.manual_seed(0)
    model = DIT_MODELS["DiT-XS/2"](in_channels=4, input_size=16, num_classes=10)
    model.eval()

    diff = create_diffusion("")
    x0 = torch.tensor(rng.standard_normal((3, 4, 16, 16)), dtype=torch.float32)
    noise = torch.tensor(rng.standard_normal((3, 4, 16, 16)), dtype=torch.float32)
    t = torch.tensor([3, 500, 977])
    y = torch.tensor([1, 5, 9])

    terms = diff.training_losses(
        lambda xx, tt, **kw: model(xx, tt.float(), kw["y"]), x0, t,
        model_kwargs={"y": y}, noise=noise,
    )
    loss = terms["loss"].mean()
    loss.backward()

    grads = {
        f"grad.{name}": t2n(p.grad)
        for name, p in model.named_parameters()
        if name
        in (
            "x_embedder.weight",
            "blocks.0.attn.qkv_proj.weight",
            "blocks.0.gain_msa",
            "blocks.5.mlp.net.0.weight",
            "blocks.5.modulation.1.weight",
            "final_layer.linear.weight",
            "final_layer.gain_mod",
            "final_layer.mean_scale.reference",
            "y_embedder.embedding.weight",
        )
    }
    sd = {f"sd.{k}": t2n(v) for k, v in model.state_dict().items()}
    dump(
        out_dir,
        "gradients",
        x0=t2n(x0),
        noise=t2n(noise),
        t=t2n(t),
        y=t2n(y),
        loss=t2n(loss),
        **grads,
        **sd,
    )


def make_trained_checkpoint(ref, out_dir, rng):
    """TRAINED-artifact interop golden (VERDICT r04 #7): run the reference's
    own training recipe for 200 real steps — Adam(0.9,0.99) lr 1e-2 as in
    `train.py:57`, in-forward forced weight normalization, embedding
    dropout active via model.train() (`train.py:69`) — then dump:

    * ``trained_reference.pt``: the exact `train.py:124-132` checkpoint
      format ({model, opt} state dicts) for the .pt ingestion path;
    * ``trained_reference.npz``: the same state_dict as arrays plus
      eval-mode forward outputs and a deterministic 8-step DDIM eta=0 CFG
      chain at the trained weights — numeric parity WITHOUT torch.

    Trained weights exercise the normalize-at-load path that init-state
    goldens cannot: after the last opt.step() the stored weights are NOT
    unit-norm rows (the forced-WN copy happens at the START of forward),
    so an importer that skips re-normalization diverges.
    """
    from diffusion import create_diffusion
    from src.models import DIT_MODELS

    torch.manual_seed(7)
    model = DIT_MODELS["DiT-XS/4"](in_channels=4, input_size=16, num_classes=10)
    d = create_diffusion("")
    opt = torch.optim.Adam(model.parameters(), lr=1e-2, betas=(0.9, 0.99))
    model.train()
    g = torch.Generator().manual_seed(11)
    first_loss = last_loss = None
    for step in range(200):
        x0 = torch.randn(16, 4, 16, 16, generator=g)
        y = torch.randint(0, 10, (16,), generator=g)
        t = torch.randint(0, d.num_timesteps, (16,), generator=g)
        loss = d.training_losses(
            lambda xx, tt, **kw: model(xx, tt.float(), kw["y"]), x0, t,
            model_kwargs={"y": y},
        )["loss"].mean()
        opt.zero_grad()
        loss.backward()
        opt.step()
        if first_loss is None:
            first_loss = float(loss)
        last_loss = float(loss)
    print(f"trained reference 200 steps: loss {first_loss:.4f} -> {last_loss:.4f}")

    torch.save(
        {"model": model.state_dict(), "opt": opt.state_dict()},
        os.path.join(out_dir, "trained_reference.pt"),
    )

    model.eval()
    x = torch.tensor(rng.standard_normal((4, 4, 16, 16)), dtype=torch.float32)
    tt = torch.tensor([0.0, 123.0, 500.0, 999.0])
    yy = torch.tensor([0, 3, 7, 10])
    with torch.no_grad():
        fwd = model(x, tt, yy)

    n = 2
    z = torch.tensor(rng.standard_normal((n, 4, 16, 16)), dtype=torch.float32)
    z_cfg = torch.cat([z, z], dim=0)
    y_cfg = torch.tensor([1, 5, 10, 10])
    cfg_scale = 1.5
    dd = create_diffusion("ddim8")
    wrapped = dd._wrap_model(
        lambda xx, tq, **kw: model.forward_with_cfg(xx, tq, kw["y"], cfg_scale)
    )
    xc = z_cfg.clone()
    with torch.no_grad():
        for i in reversed(range(dd.num_timesteps)):
            t_row = torch.full((xc.shape[0],), i, dtype=torch.long)
            xc = dd.ddim_sample(
                wrapped, xc, t_row, clip_denoised=True, eta=0.0,
                model_kwargs={"y": y_cfg},
            )["sample"]

    sd = {f"sd.{k}": t2n(v) for k, v in model.state_dict().items()}
    dump(
        out_dir,
        "trained_reference",
        x=t2n(x), t=t2n(tt), y=t2n(yy), fwd=t2n(fwd),
        z_cfg=t2n(z_cfg), y_cfg=t2n(y_cfg),
        cfg_scale=np.float32(cfg_scale),
        ddim_final=t2n(xc),
        loss_first=np.float32(first_loss), loss_last=np.float32(last_loss),
        **sd,
    )


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--reference", default="/root/reference")
    p.add_argument("--out", default=os.path.join(os.path.dirname(__file__), "..", "tests", "golden"))
    args = p.parse_args()

    sys.path.insert(0, args.reference)
    os.makedirs(args.out, exist_ok=True)
    rng = np.random.default_rng(1234)
    torch.manual_seed(1234)

    make_mp_ops(args.reference, args.out, rng)
    make_model(args.reference, args.out, rng)
    make_diffusion(args.reference, args.out, rng)
    make_sampler_chains(args.reference, args.out, rng)
    make_gradient_golden(args.reference, args.out, rng)
    make_ema(args.reference, args.out, rng)
    make_e2e_sample(args.reference, args.out, rng)
    make_trained_checkpoint(args.reference, args.out, rng)


if __name__ == "__main__":
    main()

