"""Parity of JAX SVC/RandomForest/StandardScaler inference vs sklearn
(the reference's acoustic classifiers, sentiment_analysis.py:567-777)."""

import numpy as np
import pytest
from sklearn.ensemble import RandomForestClassifier
from sklearn.preprocessing import StandardScaler
from sklearn.svm import SVC

from audio_processor_tpu.models.sklearn_infer import (
    convert_forest, convert_scaler, convert_svc, forest_predict,
    forest_predict_proba, scaler_transform, svc_predict, svc_predict_proba,
)


def make_data(rng, n=400, d=38, k=4):
    x = rng.standard_normal((n, d)).astype(np.float64)
    centers = rng.standard_normal((k, d)) * 2.0
    y = rng.integers(0, k, n)
    x += centers[y]
    return x, y


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(42)
    return make_data(rng)


@pytest.fixture(scope="module")
def test_x():
    rng = np.random.default_rng(7)
    return make_data(rng, n=64)[0].astype(np.float32)


def test_scaler_parity(data, test_x):
    x, _ = data
    sc = StandardScaler().fit(x)
    ours = np.asarray(scaler_transform(convert_scaler(sc), test_x))
    ref = sc.transform(test_x)
    np.testing.assert_allclose(ours, ref, atol=1e-4)


@pytest.mark.parametrize("impl", ["jax", "numpy"])
@pytest.mark.parametrize("k", [2, 3, 4])
def test_svc_parity(k, impl, test_x):
    from audio_processor_tpu.models.sklearn_infer import (
        svc_predict_np, svc_predict_proba_np,
    )

    rng = np.random.default_rng(k)
    x, y = make_data(rng, n=300, k=k)
    svc = SVC(kernel="rbf", probability=True, random_state=0).fit(x, y)
    model = convert_svc(svc)
    pred_fn = svc_predict if impl == "jax" else svc_predict_np
    proba_fn = svc_predict_proba if impl == "jax" else svc_predict_proba_np

    ref_pred = svc.predict(test_x)
    got_pred = model["classes"][np.asarray(pred_fn(model, test_x))]
    assert (got_pred == ref_pred).mean() == 1.0

    ref_proba = svc.predict_proba(test_x)
    got_proba = np.asarray(proba_fn(model, test_x))
    np.testing.assert_allclose(got_proba, ref_proba, atol=2e-4)


def test_svc_requires_probability(data):
    x, y = data
    svc = SVC(kernel="rbf", probability=False).fit(x, y)
    with pytest.raises(ValueError):
        convert_svc(svc)


@pytest.mark.parametrize("impl", ["jax", "numpy"])
@pytest.mark.parametrize("n_estimators,max_depth", [(10, 4), (25, None)])
def test_forest_parity(data, test_x, n_estimators, max_depth, impl):
    from audio_processor_tpu.models.sklearn_infer import (
        forest_predict_np, forest_predict_proba_np,
    )

    x, y = data
    rf = RandomForestClassifier(n_estimators=n_estimators,
                                max_depth=max_depth,
                                random_state=0).fit(x, y)
    model = convert_forest(rf)
    proba_fn = (forest_predict_proba if impl == "jax"
                else forest_predict_proba_np)
    pred_fn = forest_predict if impl == "jax" else forest_predict_np
    ref_proba = rf.predict_proba(test_x)
    got_proba = np.asarray(proba_fn(model, test_x))
    np.testing.assert_allclose(got_proba, ref_proba, atol=1e-5)
    ref_pred = rf.predict(test_x)
    got_pred = model["classes"][np.asarray(pred_fn(model, test_x))]
    assert (got_pred == ref_pred).all()


def test_svc_string_classes(test_x):
    """The acoustic models may carry string class labels."""
    rng = np.random.default_rng(1)
    x, y = make_data(rng, n=200, k=3)
    labels = np.array(["content", "mécontent", "neutre"])[y]
    svc = SVC(kernel="rbf", probability=True, random_state=0).fit(x, labels)
    model = convert_svc(svc)
    got = model["classes"][np.asarray(svc_predict(model, test_x))]
    assert (got == svc.predict(test_x)).all()


@pytest.mark.parametrize("impl", ["jax", "numpy"])
@pytest.mark.parametrize("kernel,kw", [
    ("linear", {}),
    ("poly", {"degree": 3, "coef0": 1.0, "gamma": "scale"}),
    ("sigmoid", {"coef0": 0.25, "gamma": "auto"}),
])
def test_svc_kernel_parity(kernel, kw, impl, test_x):
    """Beyond the reference's RBF models: linear/poly/sigmoid SVCs
    convert and match sklearn's predictions and probabilities."""
    from audio_processor_tpu.models.sklearn_infer import (
        svc_predict_np, svc_predict_proba_np,
    )

    rng = np.random.default_rng(7)
    x, y = make_data(rng, n=300, k=3)
    svc = SVC(kernel=kernel, probability=True, random_state=0,
              **kw).fit(x, y)
    model = convert_svc(svc)
    pred_fn = svc_predict if impl == "jax" else svc_predict_np
    proba_fn = svc_predict_proba if impl == "jax" else svc_predict_proba_np

    ref_pred = svc.predict(test_x)
    got_pred = model["classes"][np.asarray(pred_fn(model, test_x))]
    assert (got_pred == ref_pred).mean() == 1.0
    np.testing.assert_allclose(np.asarray(proba_fn(model, test_x)),
                               svc.predict_proba(test_x), atol=2e-4)
