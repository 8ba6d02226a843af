"""DeepSpeech 0.1.0 acoustic model port + TF-free frozen-graph converter
(reference: data_util/deepspeech_features/deepspeech_features.py:16-275)."""

import jax
import jax.numpy as jnp
import numpy as np

from idealnerf_tpu.pipeline.audio import extract_deepspeech_features
from idealnerf_tpu.pipeline.deepspeech import (
    RELU_CLIP, deepspeech_logits, load_frozen_graph_consts, load_params,
    make_logits_fn, params_from_consts, random_params, save_frozen_graph,
)


def _tiny_params(seed=0, n_input=10, n_hidden=6):
    return random_params(jax.random.PRNGKey(seed), n_input=n_input,
                         n_hidden=n_hidden, scale=0.3)


def test_forward_shapes_and_clip():
    p = _tiny_params()
    x = jnp.asarray(np.random.RandomState(0).randn(12, 10), jnp.float32)
    out = deepspeech_logits(p, x)
    assert out.shape == (12, 29)
    assert np.all(np.isfinite(np.asarray(out)))
    # the clipped relu actually clips: blow up an input
    big = deepspeech_logits(p, x * 1e4)
    assert np.all(np.isfinite(np.asarray(big)))


def test_lstm_matches_numpy_rederivation():
    """BasicLSTMCell semantics (gate order i,j,f,o; forget_bias=1) checked
    against a step-by-step numpy implementation."""
    p = _tiny_params(seed=1)
    rng = np.random.RandomState(1)
    x = rng.randn(7, 10).astype(np.float32)

    def np_clip_relu(v):
        return np.minimum(np.maximum(v, 0.0), RELU_CLIP)

    def sig(v):
        return 1.0 / (1.0 + np.exp(-v))

    h = np_clip_relu(x @ np.asarray(p["h1"]) + np.asarray(p["b1"]))
    h = np_clip_relu(h @ np.asarray(p["h2"]) + np.asarray(p["b2"]))
    h = np_clip_relu(h @ np.asarray(p["h3"]) + np.asarray(p["b3"]))

    def lstm(kernel, bias, xs):
        kernel, bias = np.asarray(kernel), np.asarray(bias)
        hd = kernel.shape[1] // 4
        c = np.zeros(hd)
        hh = np.zeros(hd)
        out = []
        for t in range(xs.shape[0]):
            gates = np.concatenate([xs[t], hh]) @ kernel + bias
            i, j, f, o = np.split(gates, 4)
            c = c * sig(f + 1.0) + sig(i) * np.tanh(j)
            hh = np.tanh(c) * sig(o)
            out.append(hh)
        return np.stack(out)

    fw = lstm(p["fw_kernel"], p["fw_bias"], h)
    bw = lstm(p["bw_kernel"], p["bw_bias"], h[::-1])[::-1]
    hc = np_clip_relu(np.concatenate([fw, bw], -1) @ np.asarray(p["h5"])
                      + np.asarray(p["b5"]))
    expected = hc @ np.asarray(p["h6"]) + np.asarray(p["b6"])

    got = np.asarray(deepspeech_logits(p, jnp.asarray(x)))
    np.testing.assert_allclose(got, expected, rtol=2e-4, atol=2e-5)


def test_frozen_graph_roundtrip(tmp_path):
    """Converter on random weights: write a frozen GraphDef with the
    v0.1.0 node names, load without TF, bit-exact params."""
    p = _tiny_params(seed=2)
    name_map = {
        "h1": "h1", "b1": "b1", "h2": "h2", "b2": "b2",
        "h3": "h3", "b3": "b3", "h5": "h5", "b5": "b5",
        "h6": "h6", "b6": "b6",
        "fw_kernel": "bidirectional_rnn/fw/basic_lstm_cell/kernel",
        "fw_bias": "bidirectional_rnn/fw/basic_lstm_cell/bias",
        "bw_kernel": "bidirectional_rnn/bw/basic_lstm_cell/kernel",
        "bw_bias": "bidirectional_rnn/bw/basic_lstm_cell/bias",
    }
    consts = {name_map[k]: np.asarray(v) for k, v in p.items()}
    # extra non-variable consts must be ignored
    consts["some/shape"] = np.asarray([1, 2, 3], np.float32)
    pb = str(tmp_path / "output_graph.pb")
    save_frozen_graph(pb, consts)

    raw = load_frozen_graph_consts(pb)
    assert set(raw) == set(consts)
    loaded = load_params(pb)
    assert set(loaded) == set(p)
    for k in p:
        np.testing.assert_array_equal(np.asarray(loaded[k]), np.asarray(p[k]))
    # import-prefixed names also resolve
    prefixed = {"deepspeech/" + k: v for k, v in consts.items()}
    loaded2 = params_from_consts(prefixed)
    np.testing.assert_array_equal(np.asarray(loaded2["fw_kernel"]),
                                  np.asarray(p["fw_kernel"]))


def test_wired_into_feature_extractor():
    """End-to-end: raw audio -> (N, 16, 29) windows through the native
    acoustic model (deepspeech_features.py:112-180 chain)."""
    p = random_params(jax.random.PRNGKey(3), n_input=494, n_hidden=8,
                      scale=0.2)
    sr = 16000
    t = np.arange(sr) / sr
    audio = (np.sin(2 * np.pi * 440 * t) * 8000).astype(np.int16)
    aud = extract_deepspeech_features(audio, sr, num_frames=25,
                                      logits_fn=make_logits_fn(p))
    assert aud.shape == (25, 16, 29)
    assert np.all(np.isfinite(aud))
    assert np.abs(aud).max() > 0
