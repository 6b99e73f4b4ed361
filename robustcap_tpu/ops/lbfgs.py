r"""L-BFGS with strong-Wolfe line search, fully jittable.

In-repo implementation (no jaxopt dependency) mirroring the semantics of the
optimizer the reference drives SMPLify with (``torch.optim.LBFGS`` with
``line_search_fn='strong_wolfe'``, reference net/smplify/temporal_smplify.py:151):

* two-loop recursion over a fixed-size (s, y) history ring,
* first-iteration step ``t0 = min(1, 1/||g||_1) * lr``, subsequent ``t = lr``,
* bracket + zoom line search with cubic interpolation, Armijo c1=1e-4 and
  curvature c2=0.9,
* convergence on gradient-infinity-norm / step-size / function-change
  tolerances.

Everything is expressed with ``lax.while_loop`` over fixed-shape state so a
whole SMPLify refinement compiles to a single XLA program.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["lbfgs_minimize"]


def _cubic_interpolate(x1, f1, g1, x2, f2, g2, lo, hi):
    r"""Minimizer of the cubic through (x1, f1, g1), (x2, f2, g2), clamped to
    [lo, hi]; falls back to bisection when the cubic is degenerate."""
    d1 = g1 + g2 - 3 * (f1 - f2) / (x1 - x2)
    d2_square = d1 ** 2 - g1 * g2
    d2 = jnp.sqrt(jnp.maximum(d2_square, 0.0))
    t = jnp.where(
        x1 <= x2,
        x2 - (x2 - x1) * ((g2 + d2 - d1) / (g2 - g1 + 2 * d2)),
        x1 - (x1 - x2) * ((g1 + d2 - d1) / (g1 - g2 + 2 * d2)))
    ok = (d2_square >= 0) & jnp.isfinite(t)
    return jnp.where(ok, jnp.clip(t, lo, hi), (lo + hi) / 2.0)


class _LSState(NamedTuple):
    it: jnp.ndarray
    done: jnp.ndarray        # loop stop (Wolfe point found OR bracket converged)
    wolfe: jnp.ndarray       # strong Wolfe satisfied at ``t``
    # current trial
    t: jnp.ndarray
    f_new: jnp.ndarray
    g_new: jnp.ndarray
    gtd_new: jnp.ndarray
    # previous trial (bracketing)
    t_prev: jnp.ndarray
    f_prev: jnp.ndarray
    gtd_prev: jnp.ndarray
    g_prev: jnp.ndarray
    # bracket [low, high] with values
    bracketing: jnp.ndarray   # True while still expanding
    bl_t: jnp.ndarray
    bl_f: jnp.ndarray
    bl_g: jnp.ndarray
    bl_gtd: jnp.ndarray
    bh_t: jnp.ndarray
    bh_f: jnp.ndarray
    bh_g: jnp.ndarray
    bh_gtd: jnp.ndarray


def _strong_wolfe(value_and_grad_t: Callable, f0, g0, gtd0, t_init,
                  c1=1e-4, c2=0.9, max_ls=25, tol_change=1e-9):
    r"""Strong-Wolfe line search along a fixed direction.

    ``value_and_grad_t(t) -> (f, g_flat, gtd)`` evaluates at step size t.
    Returns (t, f, g). Structured as one while_loop: a bracketing phase that
    expands the step until a bracket exists, then cubic-zoom inside it.
    """
    f_t, g_t, gtd_t = value_and_grad_t(t_init)

    def cond(s: _LSState):
        return (~s.done) & (s.it < max_ls)

    def body(s: _LSState):
        def bracket_phase(s: _LSState):
            armijo_fail = (s.f_new > f0 + c1 * s.t * gtd0) | \
                          ((s.it > 0) & (s.f_new >= s.f_prev))
            wolfe_ok = jnp.abs(s.gtd_new) <= -c2 * gtd0
            grad_pos = s.gtd_new >= 0

            # case 1: Armijo violated -> bracket [prev, cur], go to zoom
            # case 2: strong Wolfe satisfied -> done
            # case 3: derivative positive -> bracket [cur, prev], zoom
            # else: extrapolate further
            min_step = s.t + 0.01 * (s.t - s.t_prev)
            max_step = s.t * 10.0
            t_next = _cubic_interpolate(s.t_prev, s.f_prev, s.gtd_prev,
                                        s.t, s.f_new, s.gtd_new,
                                        min_step, max_step)
            f_n, g_n, gtd_n = value_and_grad_t(t_next)

            enter_zoom = armijo_fail | ((~wolfe_ok) & grad_pos)
            done = wolfe_ok & ~armijo_fail

            lo_is_prev = armijo_fail  # armijo-fail: [prev, cur]
            bl_t = jnp.where(lo_is_prev, s.t_prev, s.t)
            bl_f = jnp.where(lo_is_prev, s.f_prev, s.f_new)
            bl_g = jnp.where(lo_is_prev, s.g_prev, s.g_new)
            bl_gtd = jnp.where(lo_is_prev, s.gtd_prev, s.gtd_new)
            bh_t = jnp.where(lo_is_prev, s.t, s.t_prev)
            bh_f = jnp.where(lo_is_prev, s.f_new, s.f_prev)
            bh_g = jnp.where(lo_is_prev, s.g_new, s.g_prev)
            bh_gtd = jnp.where(lo_is_prev, s.gtd_new, s.gtd_prev)

            keep_bracketing = ~(enter_zoom | done)
            return _LSState(
                it=s.it + 1, done=done, wolfe=done,
                t=jnp.where(keep_bracketing, t_next, s.t),
                f_new=jnp.where(keep_bracketing, f_n, s.f_new),
                g_new=jnp.where(keep_bracketing, g_n, s.g_new),
                gtd_new=jnp.where(keep_bracketing, gtd_n, s.gtd_new),
                t_prev=jnp.where(keep_bracketing, s.t, s.t_prev),
                f_prev=jnp.where(keep_bracketing, s.f_new, s.f_prev),
                gtd_prev=jnp.where(keep_bracketing, s.gtd_new, s.gtd_prev),
                g_prev=jnp.where(keep_bracketing, s.g_new, s.g_prev),
                bracketing=keep_bracketing,
                bl_t=bl_t, bl_f=bl_f, bl_g=bl_g, bl_gtd=bl_gtd,
                bh_t=bh_t, bh_f=bh_f, bh_g=bh_g, bh_gtd=bh_gtd)

        def zoom_phase(s: _LSState):
            lo_first = s.bl_f <= s.bh_f
            low_t = jnp.where(lo_first, s.bl_t, s.bh_t)
            low_f = jnp.where(lo_first, s.bl_f, s.bh_f)
            low_gtd = jnp.where(lo_first, s.bl_gtd, s.bh_gtd)
            high_t = jnp.where(lo_first, s.bh_t, s.bl_t)
            high_f = jnp.where(lo_first, s.bh_f, s.bl_f)
            high_gtd = jnp.where(lo_first, s.bh_gtd, s.bl_gtd)

            xmin = jnp.minimum(s.bl_t, s.bh_t)
            xmax = jnp.maximum(s.bl_t, s.bh_t)
            t_new = _cubic_interpolate(s.bl_t, s.bl_f, s.bl_gtd,
                                       s.bh_t, s.bh_f, s.bh_gtd, xmin, xmax)
            # keep the trial strictly inside a shrinking bracket
            eps = 0.1 * (xmax - xmin)
            too_close = jnp.minimum(xmax - t_new, t_new - xmin) < eps
            t_new = jnp.where(too_close,
                              jnp.where(t_new >= (xmin + xmax) / 2,
                                        xmax - eps, xmin + eps),
                              t_new)
            f_n, g_n, gtd_n = value_and_grad_t(t_new)

            armijo_fail = (f_n > f0 + c1 * t_new * gtd0) | (f_n >= low_f)
            wolfe_ok = jnp.abs(gtd_n) <= -c2 * gtd0
            # bracket update
            new_high = armijo_fail | ((~wolfe_ok)
                                      & (gtd_n * (high_t - low_t) >= 0))
            # when trial replaces high end (fail or slope sign), otherwise low
            bl_t = jnp.where(armijo_fail, low_t,
                             jnp.where(new_high, low_t, t_new))
            bl_f = jnp.where(armijo_fail, low_f,
                             jnp.where(new_high, low_f, f_n))
            bl_gtd = jnp.where(armijo_fail, low_gtd,
                               jnp.where(new_high, low_gtd, gtd_n))
            bh_t = jnp.where(armijo_fail, t_new,
                             jnp.where(new_high, t_new, high_t))
            bh_f = jnp.where(armijo_fail, f_n,
                             jnp.where(new_high, f_n, high_f))
            bh_gtd = jnp.where(armijo_fail, gtd_n,
                               jnp.where(new_high, gtd_n, high_gtd))

            done = wolfe_ok & ~armijo_fail
            converged = (xmax - xmin) * 1.0 < tol_change
            return s._replace(
                it=s.it + 1, done=done | converged, wolfe=done,
                t=jnp.where(done, t_new, jnp.where(armijo_fail, s.t, t_new)),
                f_new=jnp.where(done | ~armijo_fail, f_n, s.f_new),
                g_new=jnp.where(done | ~armijo_fail, g_n, s.g_new),
                gtd_new=jnp.where(done | ~armijo_fail, gtd_n, s.gtd_new),
                bl_t=bl_t, bl_f=bl_f, bl_g=s.bl_g, bl_gtd=bl_gtd,
                bh_t=bh_t, bh_f=bh_f, bh_g=s.bh_g, bh_gtd=bh_gtd)

        return jax.lax.cond(s.bracketing, bracket_phase, zoom_phase, s)

    init = _LSState(
        it=jnp.asarray(0), done=jnp.asarray(False), wolfe=jnp.asarray(False),
        t=jnp.asarray(t_init, f0.dtype), f_new=f_t, g_new=g_t, gtd_new=gtd_t,
        t_prev=jnp.zeros_like(f0), f_prev=f0, gtd_prev=gtd0, g_prev=g0,
        bracketing=jnp.asarray(True),
        bl_t=jnp.zeros_like(f0), bl_f=f0, bl_g=g0, bl_gtd=gtd0,
        bh_t=jnp.asarray(t_init, f0.dtype), bh_f=f_t, bh_g=g_t, bh_gtd=gtd_t)
    out = jax.lax.while_loop(cond, body, init)
    # Exit selection (mirrors torch returning bracket[low_pos]): a Wolfe
    # point returns itself; any other exit — bracket width converged, zoom
    # iterations exhausted, or bracketing exhausted (torch treats that as
    # the bracket [0, t]) — returns the LOWEST-f candidate, never a stale
    # armijo-failing trial.
    cand_lo_t = jnp.where(out.bracketing, jnp.zeros_like(out.t), out.bl_t)
    cand_lo_f = jnp.where(out.bracketing, f0, out.bl_f)
    cand_hi_t = jnp.where(out.bracketing, out.t, out.bh_t)
    cand_hi_f = jnp.where(out.bracketing, out.f_new, out.bh_f)
    t_best = jnp.where(cand_lo_f <= cand_hi_f, cand_lo_t, cand_hi_t)
    t = jnp.where(out.wolfe, out.t, t_best)
    # the Wolfe exit already holds (f, g) at t — skip the re-evaluation then
    f, g, _ = jax.lax.cond(
        out.wolfe,
        lambda _: (out.f_new, out.g_new, out.gtd_new),
        value_and_grad_t, t)
    return t, f, g


class _LBFGSState(NamedTuple):
    x: jnp.ndarray
    f: jnp.ndarray
    g: jnp.ndarray
    d: jnp.ndarray
    t: jnp.ndarray
    s_hist: jnp.ndarray   # [m, n]
    y_hist: jnp.ndarray   # [m, n]
    rho: jnp.ndarray      # [m]
    n_stored: jnp.ndarray  # TOTAL (s, y) pairs ever stored — the ring cursor.
    # Iterations whose curvature pair is rejected (ys <= 0) do not advance
    # it, so ring indexing follows pairs actually stored, like torch's
    # old_dirs list, never the iteration counter.
    it: jnp.ndarray
    done: jnp.ndarray


def lbfgs_minimize(fun: Callable, x0: jnp.ndarray, max_iter: int = 20,
                   lr: float = 1.0, history_size: int = 20,
                   tolerance_grad: float = 1e-7,
                   tolerance_change: float = 1e-9,
                   max_ls: int = 25):
    r"""Minimize ``fun`` (flat vector -> scalar) from ``x0``.

    Returns (x, f, g). Jit-safe: fixed iteration bound, fixed history ring.
    """
    value_and_grad = jax.value_and_grad(fun)
    n = x0.shape[0]
    m = history_size

    f0, g0 = value_and_grad(x0)

    def direction(state: _LBFGSState):
        r"""Two-loop recursion over the ring history."""
        q = -state.g
        idx = (state.n_stored - 1 - jnp.arange(m)) % m   # newest-to-oldest
        valid = jnp.arange(m) < jnp.minimum(state.n_stored, m)

        def bwd(i, carry):
            q, alphas = carry
            j = idx[i]
            a = jnp.where(valid[i],
                          state.rho[j] * jnp.dot(state.s_hist[j], q), 0.0)
            q = q - a * state.y_hist[j] * valid[i]
            return q, alphas.at[i].set(a)

        q, alphas = jax.lax.fori_loop(0, m, bwd, (q, jnp.zeros(m, x0.dtype)))

        # H0 scaling: gamma = s·y / y·y of the most recently STORED pair
        last = (state.n_stored - 1) % m
        ys = jnp.dot(state.s_hist[last], state.y_hist[last])
        yy = jnp.dot(state.y_hist[last], state.y_hist[last])
        gamma = jnp.where(state.n_stored > 0, ys / jnp.maximum(yy, 1e-10),
                          1.0)
        r = q * gamma

        def fwd(i, r):
            k = m - 1 - i
            j = idx[k]
            b = jnp.where(valid[k],
                          state.rho[j] * jnp.dot(state.y_hist[j], r), 0.0)
            return r + (alphas[k] - b) * state.s_hist[j] * valid[k]

        return jax.lax.fori_loop(0, m, fwd, r)

    def cond(state: _LBFGSState):
        return (~state.done) & (state.it < max_iter)

    def body(state: _LBFGSState):
        new = _body_inner(state)
        # freeze converged lanes: under vmap the loop runs until every lane
        # finishes, and a finished lane's state must not keep moving
        return jax.tree.map(
            lambda n, o: jnp.where(state.done, o, n), new, state)

    def _body_inner(state: _LBFGSState):
        it = state.it
        d = jax.lax.cond(state.n_stored == 0, lambda s: -s.g, direction,
                         state)
        gtd = jnp.dot(state.g, d)
        t0 = jnp.where(it == 0,
                       jnp.minimum(1.0, 1.0 / jnp.sum(jnp.abs(state.g))) * lr,
                       lr)

        def eval_t(t):
            f, g = value_and_grad(state.x + t * d)
            return f, g, jnp.dot(g, d)

        t, f_new, g_new = _strong_wolfe(eval_t, state.f, state.g, gtd, t0,
                                        max_ls=max_ls,
                                        tol_change=tolerance_change)
        x_new = state.x + t * d
        s_vec = t * d
        y_vec = g_new - state.g
        ys = jnp.dot(s_vec, y_vec)
        keep = ys > 1e-10
        slot = state.n_stored % m
        s_hist = jnp.where(keep, state.s_hist.at[slot].set(s_vec),
                           state.s_hist)
        y_hist = jnp.where(keep, state.y_hist.at[slot].set(y_vec),
                           state.y_hist)
        rho = jnp.where(keep, state.rho.at[slot].set(1.0 / ys), state.rho)
        n_stored = state.n_stored + keep

        done = (jnp.max(jnp.abs(g_new)) <= tolerance_grad) \
            | (jnp.max(jnp.abs(s_vec)) <= tolerance_change) \
            | (jnp.abs(f_new - state.f) < tolerance_change) \
            | (gtd > -tolerance_change)
        return _LBFGSState(x=x_new, f=f_new, g=g_new, d=d, t=t,
                           s_hist=s_hist, y_hist=y_hist, rho=rho,
                           n_stored=n_stored, it=it + 1, done=done)

    init = _LBFGSState(
        x=x0, f=f0, g=g0, d=-g0, t=jnp.asarray(lr, x0.dtype),
        s_hist=jnp.zeros((m, n), x0.dtype), y_hist=jnp.zeros((m, n), x0.dtype),
        rho=jnp.zeros(m, x0.dtype), n_stored=jnp.asarray(0),
        it=jnp.asarray(0),
        done=jnp.max(jnp.abs(g0)) <= tolerance_grad)
    out = jax.lax.while_loop(cond, body, init)
    return out.x, out.f, out.g
