import numpy as np

from lara_tpu import types


def test_constants_match_reference():
    # data_types.hpp:77 and score.hpp:92 with C++ truncating division
    assert int(types.INFINITY) == 1431655764
    assert int(types.PSSM_INIT) == -1431655764


def test_f2i_truncates_toward_zero():
    assert types.f2i(1.0) == 8192
    assert types.f2i(-6.0) == -49152
    assert types.f2i(-2.0) == -16384
    assert types.f2i(40.0) == 327680
    # truncation, not rounding
    assert types.f2i(0.99999 / 8192) == 0
    assert types.f2i(-0.99999 / 8192) == 0


def test_ribosum_fixed_point_values():
    from lara_tpu.scoring.ribosum import ribosum65n_fixed

    mat = ribosum65n_fixed()
    # trunc(1.392427f * 8192f) = trunc(11406.76...) = 11406
    assert mat[0, 0] == 11406
    # trunc(-0.790206f * 8192f) = trunc(-6473.36...) = -6473
    assert mat[0, 1] == -6473
    assert mat[1, 0] == mat[0, 1]
    # N row/col all trunc(-1.506506f*8192f) = -12341
    assert np.all(mat[4, :] == -12341)
    assert np.all(mat[:, 4] == -12341)


def test_struct_score_reference_quirk():
    # Contact weights are int-truncated before struct_score: fixed graphs
    # (weight 10 after the x10 boost) give balance*(10+10)/2*8192 = 81920.
    assert types.struct_score(1.0, 10, 10) == 81920
    # log-mode probabilities below e^1*0.003 truncate to 0 -> structScore 0.
    assert types.contact_weight_to_int(0.97) == 0
    assert types.contact_weight_to_int(5.78) == 5
    assert types.struct_score(1.0, 0, 0) == 0
    assert types.struct_score(0.5, 5, 2) == int(np.trunc(np.float32(0.5) * 7 / 2 * 8192))


def test_dual_update_truncation():
    # dual[si] -= stepSize * subgradient[si] with int32 dual: float32 math,
    # truncation toward zero.
    dual = np.int32(-5)
    step = np.float32(2.7)
    updated = np.int32(np.trunc(np.float32(dual) - step * np.float32(1.0)))
    assert updated == -7  # trunc(-7.7) = -7
