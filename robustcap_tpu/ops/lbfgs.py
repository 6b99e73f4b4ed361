r"""L-BFGS with strong-Wolfe line search, fully jittable.

In-repo implementation (no jaxopt dependency) mirroring the semantics of the
optimizer the reference drives SMPLify with (``torch.optim.LBFGS`` with
``line_search_fn='strong_wolfe'``, reference net/smplify/temporal_smplify.py:151):

* two-loop recursion over a fixed-size (s, y) history ring,
* first-iteration step ``t0 = min(1, 1/||g||_1) * lr``, subsequent ``t = lr``,
* bracket + zoom line search with cubic interpolation, Armijo c1=1e-4 and
  curvature c2=0.9, lazy evaluation order and the insufficient-progress
  latch exactly as torch's ``_strong_wolfe``,
* a total objective-evaluation budget ``max_eval`` (default
  ``max_iter * 5 // 4`` like torch) — on hard objectives the line search
  burns several evaluations per iteration and the optimizer stops after a
  few iterations; omitting this lets the optimizer wander ~200x further
  than torch on saturated SMPLify objectives,
* convergence on gradient-infinity-norm / step-size / function-change /
  directional-derivative tolerances, in torch's check order (the flat-
  direction break happens BEFORE the step is taken).

Everything is expressed with ``lax.while_loop`` over fixed-shape state so a
whole SMPLify refinement compiles to a single XLA program. Trajectory
agreement with torch is measured in tests/test_reference_parity_smplify.py.
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
    ls_iter: jnp.ndarray     # in-loop evaluations so far (torch's ls_iter)
    done: jnp.ndarray        # loop stop (Wolfe point found OR converged)
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
    insuf: jnp.ndarray        # zoom insufficient-progress latch
    bl_t: jnp.ndarray
    bl_f: jnp.ndarray
    bl_g: jnp.ndarray
    bl_gtd: jnp.ndarray
    bh_t: jnp.ndarray
    bh_f: jnp.ndarray
    bh_g: jnp.ndarray
    bh_gtd: jnp.ndarray


def _strong_wolfe(value_and_grad_t: Callable, f0, g0, gtd0, t_init, d_norm,
                  c1=1e-4, c2=0.9, max_ls=25, tol_change=1e-9):
    r"""Strong-Wolfe line search along a fixed direction.

    ``value_and_grad_t(t) -> (f, g_flat, gtd)`` evaluates at step size t;
    ``d_norm`` is the direction's infinity norm (bracket-convergence
    scaling). Returns (t, f, g, n_evals) where ``n_evals`` counts objective
    evaluations the way torch's ``_strong_wolfe`` does. Structured as one
    while_loop mirroring torch's two phases: exit conditions are checked on
    the CURRENT trial before any new evaluation, so the evaluation count —
    which the caller charges against its ``max_eval`` budget — matches
    torch's step for step.
    """
    f_t, g_t, gtd_t = value_and_grad_t(t_init)

    def cond(s: _LSState):
        return (~s.done) & (s.ls_iter < max_ls)

    def body(s: _LSState):
        def bracket_phase(s: _LSState):
            # decide on the CURRENT trial first — no evaluation on exits
            armijo_fail = (s.f_new > f0 + c1 * s.t * gtd0) | \
                          ((s.ls_iter > 1) & (s.f_new >= s.f_prev))
            # (the ls_iter > 1 guard is torch's, kept verbatim)
            wolfe_ok = jnp.abs(s.gtd_new) <= -c2 * gtd0
            grad_pos = s.gtd_new >= 0

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

            # extrapolate + evaluate only when continuing
            min_step = s.t + 0.01 * (s.t - s.t_prev)
            max_step = s.t * 10.0
            t_next = _cubic_interpolate(s.t_prev, s.f_prev, s.gtd_prev,
                                        s.t, s.f_new, s.gtd_new,
                                        min_step, max_step)
            keep = ~(enter_zoom | done)

            def advance(_):
                f_n, g_n, gtd_n = value_and_grad_t(t_next)
                return _LSState(
                    ls_iter=s.ls_iter + 1, done=done, wolfe=done,
                    t=t_next, f_new=f_n, g_new=g_n, gtd_new=gtd_n,
                    t_prev=s.t, f_prev=s.f_new, gtd_prev=s.gtd_new,
                    g_prev=s.g_new, bracketing=jnp.asarray(True),
                    insuf=s.insuf,
                    bl_t=bl_t, bl_f=bl_f, bl_g=bl_g, bl_gtd=bl_gtd,
                    bh_t=bh_t, bh_f=bh_f, bh_g=bh_g, bh_gtd=bh_gtd)

            def exit_(_):
                return s._replace(
                    done=done, wolfe=done, bracketing=jnp.asarray(False),
                    bl_t=bl_t, bl_f=bl_f, bl_g=bl_g, bl_gtd=bl_gtd,
                    bh_t=bh_t, bh_f=bh_f, bh_g=bh_g, bh_gtd=bh_gtd)

            return jax.lax.cond(keep, advance, exit_, None)

        def zoom_phase(s: _LSState):
            lo_first = s.bl_f <= s.bh_f
            low_t = jnp.where(lo_first, s.bl_t, s.bh_t)
            low_f = jnp.where(lo_first, s.bl_f, s.bh_f)
            low_g = jnp.where(lo_first, s.bl_g, s.bh_g)
            low_gtd = jnp.where(lo_first, s.bl_gtd, s.bh_gtd)
            high_t = jnp.where(lo_first, s.bh_t, s.bl_t)
            high_f = jnp.where(lo_first, s.bh_f, s.bl_f)
            high_g = jnp.where(lo_first, s.bh_g, s.bl_g)
            high_gtd = jnp.where(lo_first, s.bh_gtd, s.bl_gtd)

            xmin = jnp.minimum(s.bl_t, s.bh_t)
            xmax = jnp.maximum(s.bl_t, s.bh_t)
            # torch checks bracket convergence BEFORE evaluating
            converged = (xmax - xmin) * d_norm < tol_change

            t_new = _cubic_interpolate(s.bl_t, s.bl_f, s.bl_gtd,
                                       s.bh_t, s.bh_f, s.bh_gtd, xmin, xmax)
            # torch's insufficient-progress latch: clamp to the interior
            # only on the SECOND consecutive edge-hugging trial (or when
            # the trial leaves the bracket)
            eps = 0.1 * (xmax - xmin)
            close = jnp.minimum(xmax - t_new, t_new - xmin) < eps
            outside = (t_new >= xmax) | (t_new <= xmin)
            do_clamp = close & (s.insuf | outside)
            t_new = jnp.where(
                do_clamp,
                jnp.where(jnp.abs(t_new - xmax) < jnp.abs(t_new - xmin),
                          xmax - eps, xmin + eps),
                t_new)
            insuf_next = close & ~(s.insuf | outside)

            def advance(_):
                f_n, g_n, gtd_n = value_and_grad_t(t_new)
                armijo_fail = (f_n > f0 + c1 * t_new * gtd0) | (f_n >= low_f)
                wolfe_ok = jnp.abs(gtd_n) <= -c2 * gtd0
                new_high = armijo_fail | ((~wolfe_ok)
                                          & (gtd_n * (high_t - low_t) >= 0))
                bl_t = jnp.where(armijo_fail, low_t,
                                 jnp.where(new_high, low_t, t_new))
                bl_f = jnp.where(armijo_fail, low_f,
                                 jnp.where(new_high, low_f, f_n))
                bl_g = jnp.where(armijo_fail, low_g,
                                 jnp.where(new_high, low_g, g_n))
                bl_gtd = jnp.where(armijo_fail, low_gtd,
                                   jnp.where(new_high, low_gtd, gtd_n))
                bh_t = jnp.where(armijo_fail, t_new,
                                 jnp.where(new_high, t_new, high_t))
                bh_f = jnp.where(armijo_fail, f_n,
                                 jnp.where(new_high, f_n, high_f))
                bh_g = jnp.where(armijo_fail, g_n,
                                 jnp.where(new_high, g_n, high_g))
                bh_gtd = jnp.where(armijo_fail, gtd_n,
                                   jnp.where(new_high, gtd_n, high_gtd))
                done = wolfe_ok & ~armijo_fail
                return s._replace(
                    ls_iter=s.ls_iter + 1, done=done, wolfe=done,
                    insuf=insuf_next,
                    t=jnp.where(done, t_new, s.t),
                    f_new=jnp.where(done, f_n, s.f_new),
                    g_new=jnp.where(done, g_n, s.g_new),
                    gtd_new=jnp.where(done, gtd_n, s.gtd_new),
                    bl_t=bl_t, bl_f=bl_f, bl_g=bl_g, bl_gtd=bl_gtd,
                    bh_t=bh_t, bh_f=bh_f, bh_g=bh_g, bh_gtd=bh_gtd)

            def exit_(_):
                return s._replace(done=jnp.asarray(True))

            return jax.lax.cond(converged, exit_, advance, None)

        return jax.lax.cond(s.bracketing, bracket_phase, zoom_phase, s)

    init = _LSState(
        ls_iter=jnp.asarray(0), done=jnp.asarray(False),
        wolfe=jnp.asarray(False),
        t=jnp.asarray(t_init, f0.dtype), f_new=f_t, g_new=g_t, gtd_new=gtd_t,
        t_prev=jnp.zeros_like(f0), f_prev=f0, gtd_prev=gtd0, g_prev=g0,
        bracketing=jnp.asarray(True), insuf=jnp.asarray(False),
        bl_t=jnp.zeros_like(f0), bl_f=f0, bl_g=g0, bl_gtd=gtd0,
        bh_t=jnp.asarray(t_init, f0.dtype), bh_f=f_t, bh_g=g_t, bh_gtd=gtd_t)
    out = jax.lax.while_loop(cond, body, init)
    # Exit selection (mirrors torch returning bracket[low_pos]): a Wolfe
    # point returns itself; any other exit — bracket width converged, zoom
    # iterations exhausted, or bracketing exhausted (torch treats that as
    # the bracket [0, t]) — returns the LOWEST-f bracket end.
    cand_lo_t = jnp.where(out.bracketing, jnp.zeros_like(out.t), out.bl_t)
    cand_lo_f = jnp.where(out.bracketing, f0, out.bl_f)
    cand_lo_g = jnp.where(out.bracketing, g0, out.bl_g)
    cand_hi_t = jnp.where(out.bracketing, out.t, out.bh_t)
    cand_hi_f = jnp.where(out.bracketing, out.f_new, out.bh_f)
    cand_hi_g = jnp.where(out.bracketing, out.g_new, out.bh_g)
    lo_best = cand_lo_f <= cand_hi_f
    t_best = jnp.where(lo_best, cand_lo_t, cand_hi_t)
    f_best = jnp.where(lo_best, cand_lo_f, cand_hi_f)
    g_best = jnp.where(lo_best, cand_lo_g, cand_hi_g)
    # torch returns the stored bracket values without a re-evaluation —
    # both bracket ends carry their (f, g), so neither do we
    t = jnp.where(out.wolfe, out.t, t_best)
    f = jnp.where(out.wolfe, out.f_new, f_best)
    g = jnp.where(out.wolfe, out.g_new, g_best)
    return t, f, g, out.ls_iter + 1   # + the t_init evaluation


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
    n_evals: jnp.ndarray  # objective evaluations (torch current_evals)
    done: jnp.ndarray


def lbfgs_minimize(fun: Callable, x0: jnp.ndarray, max_iter: int = 20,
                   lr: float = 1.0, history_size: int = 20,
                   tolerance_grad: float = 1e-7,
                   tolerance_change: float = 1e-9,
                   max_ls: int = 25, max_eval: int = None):
    r"""Minimize ``fun`` (flat vector -> scalar) from ``x0``.

    Returns (x, f, g). Jit-safe: fixed iteration bound, fixed history ring.
    ``max_eval`` defaults to ``max_iter * 5 // 4`` exactly like
    ``torch.optim.LBFGS``.
    """
    if max_eval is None:
        max_eval = max_iter * 5 // 4
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
        # torch breaks on a flat directional derivative BEFORE stepping
        flat_dir = gtd > -tolerance_change
        t0 = jnp.where(it == 0,
                       jnp.minimum(1.0, 1.0 / jnp.sum(jnp.abs(state.g))) * lr,
                       lr)

        def eval_t(t):
            f, g = value_and_grad(state.x + t * d)
            return f, g, jnp.dot(g, d)

        t, f_new, g_new, ls_evals = _strong_wolfe(
            eval_t, state.f, state.g, gtd, t0, jnp.max(jnp.abs(d)),
            max_ls=max_ls, tol_change=tolerance_change)
        x_new = state.x + t * d
        s_vec = t * d
        y_vec = g_new - state.g
        ys = jnp.dot(s_vec, y_vec)
        keep = (ys > 1e-10) & ~flat_dir
        slot = state.n_stored % m
        s_hist = jnp.where(keep, state.s_hist.at[slot].set(s_vec),
                           state.s_hist)
        y_hist = jnp.where(keep, state.y_hist.at[slot].set(y_vec),
                           state.y_hist)
        rho = jnp.where(keep, state.rho.at[slot].set(1.0 / ys), state.rho)
        n_stored = state.n_stored + keep

        n_evals = state.n_evals + jnp.where(flat_dir, 0, ls_evals)
        done = flat_dir \
            | (jnp.max(jnp.abs(g_new)) <= tolerance_grad) \
            | (jnp.max(jnp.abs(s_vec)) <= tolerance_change) \
            | (jnp.abs(f_new - state.f) < tolerance_change) \
            | (n_evals >= max_eval)
        # the flat-direction break keeps the PREVIOUS point (torch breaks
        # before _add_grad)
        return _LBFGSState(
            x=jnp.where(flat_dir, state.x, x_new),
            f=jnp.where(flat_dir, state.f, f_new),
            g=jnp.where(flat_dir, state.g, g_new),
            d=d, t=t, s_hist=s_hist, y_hist=y_hist, rho=rho,
            n_stored=n_stored, it=it + 1, n_evals=n_evals, done=done)

    init = _LBFGSState(
        x=x0, f=f0, g=g0, d=-g0, t=jnp.asarray(lr, x0.dtype),
        s_hist=jnp.zeros((m, n), x0.dtype), y_hist=jnp.zeros((m, n), x0.dtype),
        rho=jnp.zeros(m, x0.dtype), n_stored=jnp.asarray(0),
        it=jnp.asarray(0), n_evals=jnp.asarray(1),
        done=jnp.max(jnp.abs(g0)) <= tolerance_grad)
    out = jax.lax.while_loop(cond, body, init)
    return out.x, out.f, out.g
