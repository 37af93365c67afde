"""End-to-end sampler validation against an analytic oracle denoiser.

Golden tests pin our chain math to the reference implementation at shared
weights; this file validates it against GROUND TRUTH instead: for a
class-conditional Gaussian law x0 | y ~ N(m_y, sigma^2 I), the optimal
eps-denoiser has a closed form, so running the full sampling stack
(p_sample_loop / respacing / DDIM / DPM-Solver++ / karras grids) with that
oracle must reproduce the law's per-class moments. A bug anywhere in the
chain — coefficient tables, timestep remapping, update order, RNG
threading — shows up as moment drift or divergence that reference-parity
tests at random weights cannot see. (Reference chain under test:
/root/reference/diffusion/gaussian_diffusion.py:376-511, respace.py:65-129.)

The oracle: with acp = alphas_cumprod[t],
    E[x0 | x_t, y] = (sqrt(acp) sigma^2 x_t + (1-acp) m_y) / (acp sigma^2 + 1-acp)
    eps(x_t, t, y) = (x_t - sqrt(acp) E[x0|x_t,y]) / sqrt(1-acp)
and the LEARNED_RANGE var head is pinned to v = -1 (posterior min variance,
exact for a Gaussian conditional at small steps).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mapdit_tpu.diffusion import create_diffusion, dpm_solver_pp_loop, respacing_string

K, C, S = 4, 4, 8
M = 64  # samples per class
WITHIN_STD = 0.4
# deterministic, well-separated channel-constant class means
CENTERS = np.array(
    [
        [0.8, -0.4, 0.2, -0.6],
        [-0.7, 0.6, -0.3, 0.5],
        [0.1, -0.8, 0.9, 0.3],
        [-0.4, 0.5, -0.8, -0.9],
    ],
    np.float32,
)

FULL = create_diffusion("")  # 1000-step tables, the oracle's t domain
ACP = jnp.asarray(np.asarray(FULL.alphas_cumprod), jnp.float32)


def oracle_model_fn(x_t, t, y=None):
    """Closed-form optimal EPSILON+LEARNED_RANGE model for the MoG law."""
    acp = ACP[t.astype(jnp.int32)][:, None, None, None]
    m = jnp.asarray(CENTERS)[y][:, :, None, None]
    s2 = WITHIN_STD**2
    post = (jnp.sqrt(acp) * s2 * x_t + (1 - acp) * m) / (acp * s2 + (1 - acp))
    eps = (x_t - jnp.sqrt(acp) * post) / jnp.sqrt(1 - acp)
    return jnp.concatenate([eps, -jnp.ones_like(eps)], axis=1)


@pytest.fixture(scope="module")
def zy():
    key = jax.random.PRNGKey(11)
    zkey, skey = jax.random.split(key)
    z = jax.random.normal(zkey, (K * M, C, S, S))
    y = jnp.repeat(jnp.arange(K, dtype=jnp.int32), M)
    return z, y, skey


def moments(samples):
    lat = np.asarray(samples).reshape(K, M, C, S, S)
    assert np.isfinite(lat).all(), "chain diverged"
    got_means = lat.mean(axis=(1, 3, 4))  # (K, C)
    mean_err = float(
        np.linalg.norm(got_means - CENTERS, axis=1).mean()
        / np.linalg.norm(CENTERS, axis=1).mean()
    )
    centered = lat - got_means[:, None, :, None, None]
    std_ratio = float(centered.std() / WITHIN_STD)
    feats = lat.mean(axis=(3, 4))
    d2 = ((feats[:, :, None, :] - CENTERS[None, None]) ** 2).sum(-1)
    label_acc = float((d2.argmin(-1) == np.arange(K)[:, None]).mean())
    return mean_err, std_ratio, label_acc


def check(samples, mean_tol, std_lo, std_hi):
    mean_err, std_ratio, label_acc = moments(samples)
    assert mean_err < mean_tol, (mean_err, std_ratio, label_acc)
    assert std_lo < std_ratio < std_hi, (mean_err, std_ratio, label_acc)
    assert label_acc == 1.0, (mean_err, std_ratio, label_acc)


class TestOracleChains:
    def test_ddpm_full_vs_respaced(self, zy):
        z, y, skey = zy
        out250 = create_diffusion("250").p_sample_loop(
            oracle_model_fn, z, skey, clip_denoised=False, model_kwargs={"y": y}
        )
        check(out250, 0.03, 0.9, 1.1)
        out50 = create_diffusion("50").p_sample_loop(
            oracle_model_fn, z, skey, clip_denoised=False, model_kwargs={"y": y}
        )
        check(out50, 0.03, 0.8, 1.1)

    def test_ddpm_fast_chain(self, zy):
        """The runtime's prestacked-coefficient scan against ground truth."""
        z, y, skey = zy
        diff = create_diffusion("50")
        out = diff.p_sample_loop_fast(
            oracle_model_fn, z, skey, clip_denoised=False, model_kwargs={"y": y}
        )
        check(out, 0.03, 0.8, 1.1)

    def test_ddim(self, zy):
        z, y, skey = zy
        diff = create_diffusion(respacing_string(25, "ddim"))
        out = diff.ddim_sample_loop(
            oracle_model_fn, z, skey, clip_denoised=False, model_kwargs={"y": y}
        )
        # deterministic ODE-style chain: means exact, ensemble std shrinks a
        # little at 25 steps (no per-step noise re-injection)
        check(out, 0.03, 0.7, 1.1)

    def test_dpm_solver_karras(self, zy):
        z, y, _ = zy
        diff = create_diffusion(respacing_string(25, "dpm++", "karras"))
        out = dpm_solver_pp_loop(
            diff, oracle_model_fn, z, clip_denoised=False, model_kwargs={"y": y}
        )
        check(out, 0.06, 0.7, 1.1)

    def test_dpm_solver_uniform_grid(self, zy):
        z, y, _ = zy
        diff = create_diffusion("25")
        out = dpm_solver_pp_loop(
            diff, oracle_model_fn, z, clip_denoised=False, model_kwargs={"y": y}
        )
        # the uniform grid undersamples the low-sigma end, over-dispersing
        # the ensemble at 25 steps (measured 1.21 with the exact oracle) —
        # the discretization bias karras grids exist to fix (1.0 band above)
        check(out, 0.06, 0.7, 1.35)

    def test_unipc_karras(self, zy):
        """UniPC (predictor-corrector, arXiv 2302.04867) through the same
        ground-truth oracle: moments recovered at 25 karras steps, tighter
        than dpm++ at matched model calls."""
        from mapdit_tpu.diffusion import unipc_loop

        z, y, _ = zy
        diff = create_diffusion(respacing_string(25, "unipc", "karras"))
        out = unipc_loop(
            diff, oracle_model_fn, z, clip_denoised=False, model_kwargs={"y": y}
        )
        check(out, 0.06, 0.7, 1.1)

    def test_unipc_uniform_grid(self, zy):
        from mapdit_tpu.diffusion import unipc_loop

        z, y, _ = zy
        diff = create_diffusion("25")
        out = unipc_loop(
            diff, oracle_model_fn, z, clip_denoised=False, model_kwargs={"y": y}
        )
        check(out, 0.06, 0.7, 1.35)
