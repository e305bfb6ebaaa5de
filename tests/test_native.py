"""Native C++ decode kernels vs the NumPy reference (bit parity)."""

import numpy as np
import pytest

from texttoaudiogrounding_tpu.native import (
    decode_multi_threshold_native,
    file_count_curves_native,
    get_lib,
)

requires_native = pytest.mark.skipif(get_lib() is None,
                                     reason="native toolchain unavailable")


@requires_native
def test_decode_parity(rng):
    from texttoaudiogrounding_tpu.evaluation.decode import \
        decode_multi_threshold

    scores = rng.uniform(size=500).astype(np.float32)
    thresholds = np.arange(1, 20) / 20.0
    for window, n_connect in ((1, 1), (3, 13), (4, 5)):
        ref = decode_multi_threshold(scores, thresholds, window,
                                     connect_n=n_connect,
                                     time_resolution=0.04,
                                     use_native=False)
        native = decode_multi_threshold_native(scores, thresholds, window,
                                               n_connect, 0.04)
        assert native is not None
        assert len(native) == len(ref)
        for a, b in zip(native, ref):
            np.testing.assert_allclose(a, b, err_msg=f"w={window}")


@requires_native
def test_count_curves_parity(rng):
    from texttoaudiogrounding_tpu.evaluation.psds import _file_count_curves

    score = np.round(rng.uniform(size=200), 2).astype(np.float32)
    timestamps = np.arange(201) * 0.04
    gt_events = [(0.5, 2.0), (4.0, 6.5)]
    native = file_count_curves_native(score, timestamps, gt_events,
                                      0.5, 0.5)
    assert native is not None
    # reference numpy path (bypass the native shortcut)
    import texttoaudiogrounding_tpu.native as nat
    lib = nat._lib
    nat._lib, nat._tried = None, True
    try:
        ref = _file_count_curves(score, timestamps, gt_events, 0.5, 0.5)
    finally:
        nat._lib, nat._tried = lib, True
    np.testing.assert_allclose(native[0], ref[0])
    np.testing.assert_array_equal(native[1], ref[1])
    np.testing.assert_array_equal(native[2], ref[2])


@requires_native
def test_native_speedup(rng):
    """The native sweep should be meaningfully faster on a large track."""
    import time

    from texttoaudiogrounding_tpu.evaluation.psds import _file_count_curves
    score = rng.uniform(size=2000).astype(np.float32)
    timestamps = np.arange(2001) * 0.04
    gts = [(1.0, 5.0), (20.0, 30.0), (50.0, 60.0)]

    t0 = time.time()
    file_count_curves_native(score, timestamps, gts, 0.5, 0.5)
    native_t = time.time() - t0

    import texttoaudiogrounding_tpu.native as nat
    lib = nat._lib
    nat._lib, nat._tried = None, True
    try:
        t0 = time.time()
        _file_count_curves(score, timestamps, gts, 0.5, 0.5)
        numpy_t = time.time() - t0
    finally:
        nat._lib, nat._tried = lib, True
    assert native_t < numpy_t


@requires_native
def test_count_curves_ct_parity(rng):
    """CTTC-aware sweep (DESED PSDS2): native == NumPy reference."""
    from texttoaudiogrounding_tpu.evaluation.psds import (
        _file_count_curves_mc)
    from texttoaudiogrounding_tpu.native import file_count_curves_ct_native

    score = np.round(rng.uniform(size=200), 2).astype(np.float32)
    timestamps = np.arange(201) * 0.04
    gt_cls = [(0.5, 2.0), (4.0, 6.5)]
    gt_other = {"dog": [(1.0, 3.0)], "cat": [(5.0, 7.0), (0.1, 0.4)],
                "empty": []}
    native = file_count_curves_ct_native(
        score, timestamps, gt_cls, gt_other, 0.5, 0.3, 0.2)
    assert native is not None
    import texttoaudiogrounding_tpu.native as nat
    lib = nat._lib
    nat._lib, nat._tried = None, True
    try:
        ref = _file_count_curves_mc(score, timestamps, gt_cls, gt_other,
                                    0.5, 0.3, 0.2)
    finally:
        nat._lib, nat._tried = lib, True
    np.testing.assert_allclose(native[0], ref[0])
    np.testing.assert_array_equal(native[1], ref[1])
    np.testing.assert_array_equal(native[2], ref[2])
    assert set(native[3]) == set(ref[3])
    for c in ref[3]:
        np.testing.assert_array_equal(native[3][c], ref[3][c],
                                      err_msg=f"class {c}")


@requires_native
def test_count_curves_ct_no_gt(rng):
    """Pure-FP file (class absent from GT) still yields CT counts."""
    from texttoaudiogrounding_tpu.evaluation.psds import (
        _file_count_curves_mc)
    from texttoaudiogrounding_tpu.native import file_count_curves_ct_native

    score = np.round(rng.uniform(size=80), 2).astype(np.float32)
    timestamps = np.arange(81) * 0.04
    gt_other = {"dog": [(0.2, 2.2)]}
    native = file_count_curves_ct_native(
        score, timestamps, [], gt_other, 0.5, 0.3, 0.2)
    assert native is not None
    import texttoaudiogrounding_tpu.native as nat
    lib = nat._lib
    nat._lib, nat._tried = None, True
    try:
        ref = _file_count_curves_mc(score, timestamps, [], gt_other,
                                    0.5, 0.3, 0.2)
    finally:
        nat._lib, nat._tried = lib, True
    np.testing.assert_allclose(native[0], ref[0])
    np.testing.assert_array_equal(native[1], ref[1])
    np.testing.assert_array_equal(native[2], ref[2])
    np.testing.assert_array_equal(native[3]["dog"], ref[3]["dog"])


def test_pack_rows_parity(rng):
    """Native GIL-free batch pack == the NumPy pad (tails zeroed,
    overlong rows truncated, trailing dims supported)."""
    from texttoaudiogrounding_tpu.data.collate import pad_sequence
    from texttoaudiogrounding_tpu.native import pack_rows_native

    for trail, dt in (((), np.float16), ((7,), np.float32),
                      ((3, 5), np.int32)):
        arrs = [np.asarray(
            rng.normal(size=(n,) + trail) * 50, dtype=dt)
            for n in (4, 9, 13, 2)]
        t = 9  # forces truncation of the 13-row entry and padding of rest
        out = np.empty((len(arrs), t) + trail, dtype=dt)
        assert pack_rows_native(out, arrs)
        ref, _ = pad_sequence(arrs, pad_to=t)
        np.testing.assert_array_equal(out, ref[:, :t])

    # pad_sequence itself routes large batches through the native path
    big = [np.ones(300000, np.float16) * (i + 1) for i in range(8)]
    big[3] = big[3][:100]
    out, lens = pad_sequence(big, bucket=320000)
    assert out.shape == (8, 320000) and lens[3] == 100
    assert out[3, 100] == 0 and out[3, 99] == 4 and out[0, 0] == 1
    assert (out[:, 300000:] == 0).all()
