"""Real-time streaming serving (eval/stream.py).

The stream must be *semantically identical* to the offline temporal
video renderer: same keyframe cadence, same centered AudioAttNet
smoothing (test_torso.py:478-498 semantics at the track boundaries),
same conditioning — only the delivery is per-frame push/pull with an
explicit smoothing lookahead.
"""

import jax
import numpy as np

from idealnerf_tpu.config import ExperimentConfig
from idealnerf_tpu.data import make_synthetic_dataset
from idealnerf_tpu.eval.reenact import reenact
from idealnerf_tpu.eval.stream import TemporalStream
from idealnerf_tpu.train.state import init_train_state
from idealnerf_tpu.train.torso import init_torso_params


def _setup(with_torso=False, n_frames=6):
    cfg = ExperimentConfig(dim_aud=64, dim_expr=8, dim_latent=32,
                           N_samples=8, N_importance=8)
    ds = make_synthetic_dataset(n_frames=n_frames, H=24, W=24, dim_expr=8,
                                with_torso=with_torso)
    state = init_train_state(jax.random.PRNGKey(0), cfg, ds.size)
    return cfg, ds, state


def _assert_stream_matches(frames, ref):
    """Stream vs offline: the stream computes AudioNet/AudioAttNet
    per-frame while the offline path batches the whole track in one
    program — XLA's conv reduction order differs at ~5e-4 in the
    features, which flips the odd inverse-CDF resampling bin. Assert
    near-equality: tight at the 99th percentile, bounded overall."""
    a, b = np.stack(frames), np.asarray(ref)
    d = np.abs(a - b)
    assert d.max() < 6e-3, f"max diff {d.max()}"
    assert (d <= 2e-5).mean() > 0.99, f"loose pixels {(d > 2e-5).mean()}"


def _drive(stream, ds, n):
    """Push n frames with reenact's exact conditioning schedule (poses
    cycle, exprs clamp at the driving track's end) and drain."""
    frames = []
    for i in range(n):
        f = stream.push(ds.auds[i],
                        expr=ds.exprs[min(i, n - 1)],
                        pose=ds.poses[i % ds.size])
        if f is not None:
            frames.append(f)
    frames.extend(stream.flush())
    return frames


def test_stream_matches_offline_reenact_head():
    """Head-only: 6 streamed frames == reenact(temporal=2) on the same
    driving track, INCLUDING the smoothed-audio boundary windows."""
    cfg, ds, state = _setup()
    n = 6
    ref = reenact(cfg, state.params, ds, driving_auds=ds.auds[:n],
                  driving_exprs=ds.exprs[:n],
                  latent_codes=state.latent_codes, max_frames=n,
                  smooth_audio=True, temporal=2, s_delta=6,
                  use_prior=True)

    stream = TemporalStream(cfg, state.params, ds,
                            latent_codes=state.latent_codes,
                            refresh=2, s_delta=6, use_prior=True,
                            smooth_audio=True)
    # centered smo_size=8 window -> 3 future frames before emission
    assert stream.algorithmic_latency_frames == 3
    frames = _drive(stream, ds, n)
    assert len(frames) == n
    _assert_stream_matches(frames, ref)


def test_stream_matches_offline_reenact_composite():
    """Head+torso at a kt1-style operating point (torso frozen between
    keyframes) streamed == offline."""
    cfg, ds, state = _setup(with_torso=True)
    tparams = init_torso_params(jax.random.PRNGKey(1), cfg)
    n = 5
    kw = dict(temporal=2, s_delta=6, delta_keep=0.75,
              delta_keep_torso=0.01, freeze_z_torso=True)
    ref = reenact(cfg, state.params, ds, driving_auds=ds.auds[:n],
                  driving_exprs=ds.exprs[:n],
                  latent_codes=state.latent_codes, torso_params=tparams,
                  max_frames=n, smooth_audio=True, use_prior=True, **kw)

    stream = TemporalStream(
        cfg, state.params, ds, torso_params=tparams,
        latent_codes=state.latent_codes, use_prior=True,
        smooth_audio=True,
        operating_point=dict(refresh=kw["temporal"],
                             s_delta=kw["s_delta"],
                             delta_keep=kw["delta_keep"],
                             delta_keep_torso=kw["delta_keep_torso"],
                             freeze_z_torso=kw["freeze_z_torso"],
                             quality_ok=True))
    assert stream.refresh == 2
    frames = _drive(stream, ds, n)
    assert len(frames) == n
    _assert_stream_matches(frames, ref)


def test_stream_push_device_matches_push():
    """push_device (the compute-isolation hook: no host fetch per push)
    emits frames bit-identical to push() on the same schedule, as
    device arrays."""
    import jax.numpy as jnp

    cfg, ds, state = _setup()
    n = 6
    a = TemporalStream(cfg, state.params, ds,
                       latent_codes=state.latent_codes,
                       refresh=3, s_delta=6, smooth_audio=False)
    b = TemporalStream(cfg, state.params, ds,
                       latent_codes=state.latent_codes,
                       refresh=3, s_delta=6, smooth_audio=False)
    for i in range(n):
        fa = a.push(ds.auds[i], pose=ds.poses[i % ds.size])
        fb = b.push_device(ds.auds[i], pose=ds.poses[i % ds.size])
        assert isinstance(fa, np.ndarray)
        assert isinstance(fb, jnp.ndarray)
        np.testing.assert_array_equal(fa, np.asarray(fb))


def test_stream_warmup_flush_and_unsmoothed_latency():
    """Push/emit accounting: smoothed streams warm up for exactly the
    lookahead, flush drains it; smooth_audio=False emits on every push
    (zero algorithmic latency) and a closed stream refuses pushes."""
    cfg, ds, state = _setup()
    stream = TemporalStream(cfg, state.params, ds,
                            latent_codes=state.latent_codes,
                            refresh=3, s_delta=6, smooth_audio=True)
    n = 5
    emitted = [stream.push(ds.auds[i]) for i in range(n)]
    warm = stream.algorithmic_latency_frames
    assert [e is None for e in emitted] == [True] * warm + [False] * (n - warm)
    tail = stream.flush()
    assert len(tail) == warm
    try:
        stream.push(ds.auds[0])
        assert False, "closed stream accepted a push"
    except RuntimeError:
        pass

    live = TemporalStream(cfg, state.params, ds,
                          latent_codes=state.latent_codes,
                          refresh=3, s_delta=6, smooth_audio=False)
    assert live.algorithmic_latency_frames == 0
    assert all(live.push(ds.auds[i]) is not None for i in range(3))
    assert live.flush() == []
    assert len(live.frame_times) == 3


def test_stream_warmup_does_not_perturb_output():
    """warmup() compiles the serving programs on dummy inputs without
    touching stream state: a warmed stream emits the same frames as a
    cold one."""
    cfg, ds, state = _setup()
    n = 4
    cold = TemporalStream(cfg, state.params, ds,
                          latent_codes=state.latent_codes,
                          refresh=2, s_delta=6, smooth_audio=False)
    ref = _drive(cold, ds, n)
    warm = TemporalStream(cfg, state.params, ds,
                          latent_codes=state.latent_codes,
                          refresh=2, s_delta=6, smooth_audio=False)
    assert warm.warmup() > 0.0
    frames = _drive(warm, ds, n)
    np.testing.assert_array_equal(np.stack(frames), np.stack(ref))


def test_stream_rejects_closed_gate():
    cfg, ds, state = _setup()
    try:
        TemporalStream(cfg, state.params, ds,
                       operating_point=dict(quality_ok=False, refresh=25,
                                            s_delta=16))
        assert False, "closed quality gate accepted"
    except ValueError:
        pass
