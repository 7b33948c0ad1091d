import numpy as np

from reluqp_tpu.core.ladder import initial_rho_index, setup_rhos


def test_default_ladder_matches_reference_shape():
    # defaults rho=0.1, tol=5, [1e-6, 1e6]: 0.1 plus 7 rungs down (to
    # 1.28e-6) and 10 rungs up (to 9.77e5) = 18 rungs, same as the reference
    rhos = setup_rhos(0.1, 1e-6, 1e6, True, 5.0)
    assert rhos.shape == (18,)
    assert np.all(np.diff(rhos) > 0)
    assert rhos.min() >= 1e-6 / 5  # last accepted rung is >= rho_min
    assert rhos.min() >= 1e-6
    assert rhos.max() <= 1e6
    # geometric: each rung is 5x its neighbor
    np.testing.assert_allclose(rhos[1:] / rhos[:-1], 5.0, rtol=1e-12)
    assert 0.1 in rhos


def test_non_adaptive_ladder_is_single_rho():
    rhos = setup_rhos(0.25, 1e-6, 1e6, False, 5.0)
    np.testing.assert_array_equal(rhos, [0.25])


def test_initial_rho_index():
    rhos = setup_rhos(0.1, 1e-6, 1e6, True, 5.0)
    assert rhos[initial_rho_index(rhos, 0.1)] == 0.1
    assert initial_rho_index(rhos, 1e-9) == 0
    assert initial_rho_index(rhos, 1e9) == len(rhos) - 1
