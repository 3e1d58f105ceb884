"""HTTP embedding server (tools/serve_embed.py --serve): engine + endpoints."""
import base64
import io
import json
import os
import sys
import threading
import urllib.request

import jax
import numpy as np
import pytest
from PIL import Image

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "tools")
)


from conftest import TINY_BASE

TINY = {**TINY_BASE, "inference_batch_size": 4}


@pytest.fixture(scope="module")
def served():
    import serve_embed

    from prcv2025reid_tpu.configs import TrainingConfig
    from prcv2025reid_tpu.models.reid_model import MultiModalReIDModel

    config = TrainingConfig(**TINY)
    model = MultiModalReIDModel(config=config, num_classes=3)
    Mv, S = len(config.vision_modalities), config.image_size
    import jax.numpy as jnp

    variables = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((2, Mv, S, S, 3), jnp.float32),
        jnp.ones((2, Mv), jnp.float32),
        jnp.zeros((2, config.text_context_length), jnp.int32),
        jnp.ones((2,), jnp.float32),
        train=False,
    )
    engine = serve_embed.make_engine(config, model, variables, 4)
    serve_embed.warmup_engine(config, engine)
    srv = serve_embed.make_server(0, "127.0.0.1", config, engine)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    url = f"http://127.0.0.1:{srv.server_address[1]}"
    yield url, engine, config
    srv.shutdown()
    srv.server_close()


def _post(url, obj):
    req = urllib.request.Request(
        url, data=json.dumps(obj).encode(),
        headers={"Content-Type": "application/json"},
    )
    try:
        with urllib.request.urlopen(req, timeout=120) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _jpeg_b64(seed=0):
    rng = np.random.default_rng(seed)
    img = (rng.random((48, 32, 3)) * 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "JPEG")
    return base64.b64encode(buf.getvalue()).decode()


def test_healthz(served):
    url, _, config = served
    with urllib.request.urlopen(url + "/healthz", timeout=30) as r:
        body = json.loads(r.read())
    assert body["status"] == "ok"
    assert body["fusion_dim"] == config.fusion_dim
    assert "text" in body["modalities"]


def test_embed_images_matches_engine(served):
    url, engine, config = served
    embed_pils = engine.embed_pils
    b64s = [_jpeg_b64(0), _jpeg_b64(1), _jpeg_b64(2)]
    code, body = _post(url + "/embed", {"images_b64": b64s, "modality": "nir"})
    assert code == 200 and body["count"] == 3
    feats = np.asarray(body["embeddings"], np.float32)
    assert feats.shape == (3, config.fusion_dim)
    # embeddings are L2-normalized and match a direct engine call
    np.testing.assert_allclose(np.linalg.norm(feats, axis=-1), 1.0, atol=1e-3)
    imgs = [
        Image.open(io.BytesIO(base64.b64decode(s))) for s in b64s
    ]
    direct = embed_pils(imgs, "nir")
    np.testing.assert_allclose(feats, direct, rtol=1e-4, atol=1e-4)


def test_embed_texts(served):
    url, engine, config = served
    embed_texts = engine.embed_texts
    code, body = _post(url + "/embed", {"texts": ["a person", "red coat"]})
    assert code == 200 and body["count"] == 2
    feats = np.asarray(body["embeddings"], np.float32)
    direct = embed_texts(["a person", "red coat"])
    np.testing.assert_allclose(feats, direct, rtol=1e-4, atol=1e-4)


def test_embed_queries_matches_singles_and_direct_model(served):
    """Combo queries: single-modality dicts must agree with the dedicated
    single-modality entry points; a multi-modal dict must match a direct
    (unjitted) encode_subset oracle built from the same deterministic init;
    mixed combos in one call come back in input order."""
    import jax.numpy as jnp

    from prcv2025reid_tpu.configs import TrainingConfig
    from prcv2025reid_tpu.data.augment import ImageTransform
    from prcv2025reid_tpu.data.tokenizer import build_tokenizer
    from prcv2025reid_tpu.models.reid_model import MultiModalReIDModel

    _, engine, config = served
    img = Image.open(io.BytesIO(base64.b64decode(_jpeg_b64(7))))
    caption = "a person in a red coat"

    q_nir = {"nir": img}
    q_text = {"text": caption}
    q_combo = {"nir": img, "text": caption}
    feats = engine.embed_queries([q_combo, q_nir, q_text])
    assert feats.shape == (3, config.fusion_dim)
    np.testing.assert_allclose(np.linalg.norm(feats, axis=-1), 1.0, atol=1e-3)

    # rows come back in input order: singles equal their dedicated paths
    np.testing.assert_allclose(
        feats[1], engine.embed_pils([img], "nir")[0], rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        feats[2], engine.embed_texts([caption])[0], rtol=1e-4, atol=1e-4
    )
    # the combo is a genuine fusion, not either single
    assert np.abs(feats[0] - feats[1]).max() > 1e-3
    assert np.abs(feats[0] - feats[2]).max() > 1e-3

    # direct oracle: rebuild the same model (deterministic PRNGKey(0) init,
    # same as the fixture) and run encode_subset on a hand-built 1-row batch
    model = MultiModalReIDModel(config=TrainingConfig(**TINY), num_classes=3)
    Mv, S = len(config.vision_modalities), config.image_size
    variables = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((2, Mv, S, S, 3), jnp.float32),
        jnp.ones((2, Mv), jnp.float32),
        jnp.zeros((2, config.text_context_length), jnp.int32),
        jnp.ones((2,), jnp.float32),
        train=False,
    )
    tf = ImageTransform(image_size=S, train=False)
    tok = build_tokenizer(
        config.tokenizer_vocab_path,
        config.text_vocab_size,
        config.text_context_length,
    )
    imgs = np.zeros((1, Mv, S, S, 3), np.float32)
    imask = np.zeros((1, Mv), np.float32)
    slot = list(config.vision_modalities).index("nir")
    imgs[0, slot] = tf(img.convert("RGB"))
    imask[0, slot] = 1.0
    raw = model.apply(
        variables,
        jnp.asarray(imgs),
        jnp.asarray(imask),
        jnp.asarray(tok([caption]).astype(np.int32)),
        jnp.ones((1,), jnp.float32),
        ("nir", "text"),
        method=model.encode_subset,
    )
    oracle = np.array(raw, np.float32)
    oracle /= np.linalg.norm(oracle, axis=1, keepdims=True)
    np.testing.assert_allclose(feats[0], oracle[0], rtol=1e-3, atol=1e-3)


def test_weighted_fusion_engine_matches_hand_sum(served):
    """fusion_mode='weighted': a combo query must equal the reference
    FeatureExtractor rule — L2-normalized per-modality embeddings summed
    with text weight 1.2, re-normalized (and singles are unchanged)."""
    import serve_embed

    from prcv2025reid_tpu.configs import TrainingConfig
    from prcv2025reid_tpu.models.reid_model import MultiModalReIDModel
    import jax.numpy as jnp

    _, engine, config = served
    # rebuild the fixture's deterministic model for a weighted engine
    model = MultiModalReIDModel(config=TrainingConfig(**TINY), num_classes=3)
    Mv, S = len(config.vision_modalities), config.image_size
    variables = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((2, Mv, S, S, 3), jnp.float32),
        jnp.ones((2, Mv), jnp.float32),
        jnp.zeros((2, config.text_context_length), jnp.int32),
        jnp.ones((2,), jnp.float32),
        train=False,
    )
    wengine = serve_embed.make_engine(
        config, model, variables, 4, fusion_mode="weighted"
    )
    img = Image.open(io.BytesIO(base64.b64decode(_jpeg_b64(9))))
    caption = "a tall person"

    # singles: identical graph in both modes
    np.testing.assert_allclose(
        wengine.embed_pils([img], "nir"), engine.embed_pils([img], "nir"),
        rtol=1e-4, atol=1e-4,
    )
    # combo: hand-computed weighted sum of the single embeddings
    combo = wengine.embed_queries([{"nir": img, "text": caption}])[0]
    f_nir = engine.embed_pils([img], "nir")[0]
    f_txt = engine.embed_texts([caption])[0]
    expect = 1.0 * f_nir + 1.2 * f_txt
    expect /= np.linalg.norm(expect)
    np.testing.assert_allclose(combo, expect, rtol=1e-3, atol=1e-3)
    # and it differs from the model-fusion combo
    model_combo = engine.embed_queries([{"nir": img, "text": caption}])[0]
    assert np.abs(combo - model_combo).max() > 1e-3

    with pytest.raises(ValueError, match="fusion_mode"):
        serve_embed.make_engine(config, model, variables, 4,
                                fusion_mode="bogus")


def test_embed_queries_http(served):
    url, engine, config = served
    code, body = _post(url + "/embed", {"queries": [
        {"nir": _jpeg_b64(3), "text": "blue jacket"},
        {"sk": _jpeg_b64(4)},
    ]})
    assert code == 200 and body["count"] == 2
    feats = np.asarray(body["embeddings"], np.float32)
    assert feats.shape == (2, config.fusion_dim)
    img3 = Image.open(io.BytesIO(base64.b64decode(_jpeg_b64(3))))
    img4 = Image.open(io.BytesIO(base64.b64decode(_jpeg_b64(4))))
    direct = engine.embed_queries(
        [{"nir": img3, "text": "blue jacket"}, {"sk": img4}]
    )
    np.testing.assert_allclose(feats, direct, rtol=1e-4, atol=1e-4)

    # malformed combo queries are clean 400s, not crashes
    code, body = _post(url + "/embed", {"queries": [{"bogus": _jpeg_b64()}]})
    assert code == 400 and "bogus" in body["error"]
    code, body = _post(url + "/embed", {"queries": [{}]})
    assert code == 400
    code, body = _post(url + "/embed", {"queries": "not-a-list"})
    assert code == 400 and "list" in body["error"]
    code, body = _post(url + "/embed", {"queries": [{"nir": "!!notb64"}]})
    assert code == 400 and "nir" in body["error"]


def test_microbatcher_coalesces_deterministically():
    """While one batch occupies the 'device', queued same-group requests must
    be served by ONE coalesced dispatch; a different group never mixes in."""
    import serve_embed

    calls = []
    release = threading.Event()
    first_entered = threading.Event()

    def fake_texts(items):
        if not calls:
            first_entered.set()
            release.wait(timeout=30)  # hold the device busy
        calls.append(("texts", list(items)))
        return np.arange(len(items), dtype=np.float32)[:, None]

    def fake_pils(items, mod):
        calls.append((("images", mod), list(items)))
        return np.zeros((len(items), 1), np.float32)

    engine = (fake_pils, fake_texts, None)
    b = serve_embed.MicroBatcher(engine, max_items=8)
    f0 = b.submit(("texts",), ["t0"])
    assert first_entered.wait(timeout=30)
    # these queue up while the first dispatch is 'on device'
    f1 = b.submit(("texts",), ["t1", "t2"])
    f2 = b.submit(("images", "nir"), ["i0"])
    f3 = b.submit(("texts",), ["t3"])
    release.set()
    r0, r1, r2, r3 = (f.result(timeout=30) for f in (f0, f1, f2, f3))
    assert r0.shape == (1, 1) and r1.shape == (2, 1) and r3.shape == (1, 1)
    assert r2.shape == (1, 1)
    text_calls = [c for c in calls if c[0] == "texts"]
    assert text_calls[0][1] == ["t0"]
    # t1,t2,t3 coalesced into ONE device dispatch; results split per request
    assert text_calls[1][1] == ["t1", "t2", "t3"]
    assert (r1[:, 0] == [0.0, 1.0]).all() and r3[0, 0] == 2.0
    assert b.dispatches == 3 and b.requests == 4

    # an engine fault reaches every coalesced requester as an exception
    def boom(items):
        raise RuntimeError("device fault")

    b2 = serve_embed.MicroBatcher((fake_pils, boom, None), max_items=8)
    with pytest.raises(RuntimeError, match="device fault"):
        b2.submit(("texts",), ["x"]).result(timeout=30)


def test_concurrent_requests_match_sequential(served):
    url, engine, config = served
    embed_texts = engine.embed_texts
    texts = [f"person number {i}" for i in range(6)]
    results = {}

    def post_one(i):
        results[i] = _post(url + "/embed", {"texts": [texts[i]]})

    threads = [threading.Thread(target=post_one, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    direct = embed_texts(texts)
    for i in range(6):
        code, body = results[i]
        assert code == 200 and body["count"] == 1
        np.testing.assert_allclose(
            np.asarray(body["embeddings"], np.float32)[0], direct[i],
            rtol=1e-4, atol=1e-4,
        )


def test_bad_requests(served):
    url, _, _ = served
    code, body = _post(url + "/embed", {"images_b64": ["xx"], "modality": "bogus"})
    assert code == 400 and "modality" in body["error"]
    code, body = _post(url + "/embed", {"nonsense": 1})
    assert code == 400
    # a bare string for 'texts' must not be embedded per character
    code, body = _post(url + "/embed", {"texts": "a red coat"})
    assert code == 400 and "list" in body["error"]
    code, body = _post(url + "/embed", {"images_b64": ["!!notbase64"]})
    assert code == 400
    # /search and enrollment without a loaded gallery are clear 404s
    code, body = _post(url + "/search", {"texts": ["x"]})
    assert code == 404 and "serve_gallery" in body["error"]
    code, body = _post(url + "/gallery/add", {"texts": ["x"], "ids": ["a"]})
    assert code == 404 and "serve_gallery" in body["error"]
    # server survives all of that
    with urllib.request.urlopen(url + "/healthz", timeout=30) as r:
        assert json.loads(r.read())["status"] == "ok"


@pytest.fixture(scope="module")
def search_served(served, tmp_path_factory):
    """A second server over the SAME engine with a gallery of 5 known nir
    embeddings loaded for /search."""
    import serve_embed

    url, engine, config = served
    embed_pils = engine.embed_pils
    imgs = [
        Image.fromarray(
            (np.random.default_rng(i).random((48, 32, 3)) * 255).astype(np.uint8)
        )
        for i in range(5)
    ]
    feats = embed_pils(imgs, "nir")
    gpath = tmp_path_factory.mktemp("gallery") / "g.npz"
    np.savez(gpath, features=feats, ids=np.asarray([f"g{i}" for i in range(5)]))
    gfeats, gids = serve_embed.load_gallery(str(gpath))
    gallery = serve_embed.GalleryStore(config.fusion_dim, gfeats, gids,
                                       path=str(gpath))
    srv = serve_embed.make_server(
        0, "127.0.0.1", config, engine, gallery=gallery,
        rerank={"top_n": 4, "k1": 3, "k2": 2, "lam": 0.3, "default": False},
    )
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    surl = f"http://127.0.0.1:{srv.server_address[1]}"
    yield surl, imgs, feats
    srv.shutdown()
    srv.server_close()


def test_search_returns_self_as_top1(search_served):
    surl, imgs, feats = search_served
    # query with gallery images 2 and 0 themselves: top-1 must be themselves
    b64s = []
    for i in (2, 0):
        buf = io.BytesIO()
        imgs[i].save(buf, "PNG")  # lossless: identical pixels -> identical feats
        b64s.append(base64.b64encode(buf.getvalue()).decode())
    code, body = _post(surl + "/search",
                       {"images_b64": b64s, "modality": "nir", "top_k": 3})
    assert code == 200 and body["count"] == 2
    assert [r[0]["id"] for r in body["results"]] == ["g2", "g0"]
    for row in body["results"]:
        assert len(row) == 3
        assert row[0]["score"] == pytest.approx(1.0, abs=1e-3)
        scores = [e["score"] for e in row]
        assert scores == sorted(scores, reverse=True)

    # top_k clamps to the gallery size instead of failing
    code, body = _post(surl + "/search",
                       {"texts": ["a person"], "top_k": 100})
    assert code == 200 and len(body["results"][0]) == 5

    # gallery size shows up in health
    with urllib.request.urlopen(surl + "/healthz", timeout=30) as r:
        assert json.loads(r.read())["gallery_size"] == 5

    # invalid top_k is a 400
    code, body = _post(surl + "/search", {"texts": ["x"], "top_k": "ten"})
    assert code == 400 and "top_k" in body["error"]


def test_search_rerank(search_served):
    """Per-request k-reciprocal re-ranking on /search: self-match stays
    top-1 with a fused score ~1, scores stay descending, the flag is
    validated, and the re-ranked head caps the result length."""
    surl, imgs, feats = search_served
    buf = io.BytesIO()
    imgs[1].save(buf, "PNG")  # lossless: query IS gallery image 1
    b64 = base64.b64encode(buf.getvalue()).decode()
    code, body = _post(surl + "/search", {"images_b64": [b64],
                                          "modality": "nir", "top_k": 3,
                                          "rerank": True})
    assert code == 200 and body["reranked"] is True
    row = body["results"][0]
    assert row[0]["id"] == "g1"
    assert row[0]["score"] == pytest.approx(1.0, abs=2e-2)
    scores = [e["score"] for e in row]
    assert scores == sorted(scores, reverse=True) and len(row) == 3
    # default (no flag, server default False) stays plain cosine
    code, plain = _post(surl + "/search", {"images_b64": [b64],
                                           "modality": "nir", "top_k": 3})
    assert code == 200 and plain["reranked"] is False
    assert plain["results"][0][0]["id"] == "g1"
    # top_k beyond the re-ranked head clamps to the candidate count (top_n=4)
    code, body = _post(surl + "/search", {"texts": ["a person"],
                                          "top_k": 100, "rerank": True})
    assert code == 200 and len(body["results"][0]) == 4
    # malformed flag is a clean 400
    code, body = _post(surl + "/search", {"texts": ["x"], "rerank": "yes"})
    assert code == 400 and "rerank" in body["error"]


def test_gallery_store_semantics(tmp_path):
    """GalleryStore: capacity doubles (no per-add recompile of the ranking
    graph), -inf padding never surfaces, remove drops every row of an id,
    save -> load_gallery roundtrips, shape errors are loud."""
    import serve_embed

    rng = np.random.default_rng(0)
    store = serve_embed.GalleryStore(8, min_capacity=4)
    assert store.size == 0 and store.capacity == 4
    assert store.search(rng.random((2, 8)).astype(np.float32), 5) == [[], []]

    f = rng.standard_normal((5, 8)).astype(np.float32)
    f /= np.linalg.norm(f, axis=1, keepdims=True)
    store.add(f[:3], ["a", "b", "a"])
    assert store.size == 3 and store.capacity == 4
    store.add(f[3:], ["c", "d"])
    assert store.size == 5 and store.capacity == 8  # doubled exactly once

    # k clamps to the live size; padding rows can never appear
    res = store.search(f[[1]], 100)
    assert len(res[0]) == 5
    assert res[0][0]["id"] == "b"
    assert res[0][0]["score"] == pytest.approx(1.0, abs=1e-4)
    assert all(np.isfinite(e["score"]) for e in res[0])

    # remove drops EVERY row with a matching id; unknown ids are ignored
    assert store.remove(["a", "nope"]) == 2
    assert store.size == 3
    assert "a" not in [e["id"] for e in store.search(f[[0]], 3)[0]]

    # save -> load_gallery roundtrip preserves order and values
    p = tmp_path / "g.npz"
    store.save(str(p))
    feats2, ids2 = serve_embed.load_gallery(str(p))
    assert ids2 == ["b", "c", "d"]
    np.testing.assert_allclose(feats2, f[[1, 3, 4]], atol=1e-6)

    with pytest.raises(ValueError, match="features"):
        store.add(np.zeros((1, 9), np.float32), ["x"])
    with pytest.raises(ValueError, match="ids"):
        store.add(np.zeros((2, 8), np.float32), ["x"])
    with pytest.raises(ValueError, match="path"):
        serve_embed.GalleryStore(8).save()


def _fixture_variables():
    """Rebuild the ``served`` fixture's exact weights (same PRNGKey(0)
    init) so reload tests can hold the variables the engine closed over."""
    import jax
    import jax.numpy as jnp

    from prcv2025reid_tpu.configs import TrainingConfig
    from prcv2025reid_tpu.models.reid_model import MultiModalReIDModel

    config = TrainingConfig(**TINY)
    model = MultiModalReIDModel(config=config, num_classes=3)
    Mv, S = len(config.vision_modalities), config.image_size
    return model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((2, Mv, S, S, 3), jnp.float32),
        jnp.ones((2, Mv), jnp.float32),
        jnp.zeros((2, config.text_context_length), jnp.int32),
        jnp.ones((2,), jnp.float32),
        train=False,
    )


def test_admin_reload_hot_swaps_weights(served):
    """POST /admin/reload goes through the server-side reloader: a raise
    is a clean 500 with weights untouched; success swaps the served
    weights (features change), reports a new fingerprint, and counts in
    /healthz.  A server built without a reloader 404s."""
    import jax

    import serve_embed

    url, engine, config = served
    # no reloader on the module fixture's server -> 404
    code, body = _post(url + "/admin/reload", {})
    assert code == 404 and "reload" in body["error"]

    texts = ["a person in red"]
    before = engine.embed_texts(texts)
    variables = _fixture_variables()
    scaled = {**variables,
              "params": jax.tree_util.tree_map(lambda x: x * 1.5,
                                               variables["params"])}
    calls = {"n": 0}

    def reloader():
        calls["n"] += 1
        if calls["n"] == 1:
            raise FileNotFoundError("checkpoint not ready yet")
        return scaled if calls["n"] == 2 else variables

    srv = serve_embed.make_server(0, "127.0.0.1", config, engine,
                                  reloader=reloader)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    rurl = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        # 1st: reloader raises -> clean 500, weights untouched
        code, body = _post(rurl + "/admin/reload", {})
        assert code == 500 and "reload failed" in body["error"]
        np.testing.assert_array_equal(engine.embed_texts(texts), before)
        # 2nd: scaled weights go live — no restart, no recompile
        code, body = _post(rurl + "/admin/reload", {})
        assert code == 200 and body["reloaded"] is True
        fp_scaled = body["weights_fingerprint"]
        after = engine.embed_texts(texts)
        assert not np.allclose(before, after)
        with urllib.request.urlopen(rurl + "/healthz", timeout=60) as r:
            assert json.loads(r.read())["weights_reloads"] == 1
        # 3rd: original weights restore the original features exactly
        code, body = _post(rurl + "/admin/reload", {})
        assert code == 200 and body["weights_fingerprint"] != fp_scaled
        np.testing.assert_allclose(engine.embed_texts(texts), before,
                                   atol=1e-6)
    finally:
        engine.reload(variables)  # leave the module-scoped engine pristine
        srv.shutdown()
        srv.server_close()


def test_metrics_endpoint(served):
    """/metrics serves Prometheus text with per-route counters that
    actually advance."""
    url, _, _ = served
    _post(url + "/embed", {"texts": ["x"]})
    with urllib.request.urlopen(url + "/metrics", timeout=60) as r:
        assert r.status == 200
        assert "text/plain" in r.headers["Content-Type"]
        text = r.read().decode()
    assert 'reid_requests_total{route="/embed",code="200"}' in text
    assert 'reid_request_seconds_sum{route="/embed"}' in text
    assert "reid_batch_dispatches_total" in text
    assert "reid_gallery_size 0" in text
    # unknown paths bucket under "other" (bounded label cardinality)
    _post(url + "/does/not/exist", {})
    with urllib.request.urlopen(url + "/metrics", timeout=60) as r:
        text2 = r.read().decode()
    assert 'route="other",code="404"' in text2


def test_artifact_bundle_serves_without_model_code(served, tmp_path):
    """tools/export_serving.py -> tools/serve_artifact.py round trip: the
    bundle's deserialized graphs serve the SAME HTTP API and agree with
    the live engine, with no model/checkpoint code on the consumer path."""
    import importlib.util
    import os as oslib

    import jax

    import serve_embed

    def _load_tool(name):
        spec = importlib.util.spec_from_file_location(
            name, oslib.path.join(oslib.path.dirname(__file__), "..",
                                  "tools", f"{name}.py"),
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod

    export_serving = _load_tool("export_serving")
    serve_artifact = _load_tool("serve_artifact")

    url, engine, config = served
    variables = _fixture_variables()
    from prcv2025reid_tpu.models.reid_model import MultiModalReIDModel

    model = MultiModalReIDModel(config=config, num_classes=3)
    export_serving.write_bundle(
        str(tmp_path), config, model, variables, 4,
        graphs=["gallery_vis", "text", "quad", "combo_nir+text"],
        platforms=("cpu",),
    )
    shim, graphs = serve_artifact.load_bundle(str(tmp_path))
    assert set(graphs) == {"gallery_vis", "text", "quad", "combo_nir+text"}
    assert graphs["combo_nir+text"]["modalities"] == ("nir", "text")
    aengine = serve_artifact.make_artifact_engine(shim, graphs)

    # numerical agreement with the live engine on every routed path
    texts = ["a person with a hat", "someone in blue"]
    np.testing.assert_allclose(
        aengine.embed_texts(texts), engine.embed_texts(texts), atol=1e-5
    )
    img = Image.fromarray(
        (np.random.default_rng(5).random((40, 30, 3)) * 255).astype(np.uint8)
    )
    np.testing.assert_allclose(
        aengine.embed_pils([img], "vis"), engine.embed_pils([img], "vis"),
        atol=1e-5,
    )
    q = [{"nir": img, "text": "red coat"}]
    np.testing.assert_allclose(
        aengine.embed_queries(q), engine.embed_queries(q), atol=1e-5
    )
    # a combo the bundle does not provide is a clean error, not garbage
    with pytest.raises(ValueError, match="no exported graph"):
        aengine.embed_queries([{"sk": img}])
    with pytest.raises(RuntimeError, match="immutable"):
        aengine.reload({})

    # the artifact engine drives the SAME HTTP server implementation
    gal = aengine.embed_pils([img], "vis")
    store = serve_embed.GalleryStore(shim.fusion_dim, gal, ["g0"])
    srv = serve_embed.make_server(0, "127.0.0.1", shim, aengine,
                                  gallery=store)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    aurl = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        code, body = _post(aurl + "/embed", {"texts": ["x"]})
        assert code == 200 and len(body["embeddings"][0]) == shim.fusion_dim
        code, body = _post(aurl + "/search", {"texts": ["x"], "top_k": 1})
        assert code == 200 and body["results"][0][0]["id"] == "g0"
    finally:
        srv.shutdown()
        srv.server_close()


def test_bundle_ships_tokenizer_vocab(served, tmp_path):
    """A checkpoint with a BPE vocab exports it INTO the bundle, and the
    artifact shim resolves it — the consumer cannot silently
    hash-tokenize a trained model's captions."""
    import importlib.util
    import json as jsonlib
    import os as oslib

    import serve_embed  # noqa: F401 — same module instance as the fixture

    def _load_tool(name, alias):
        spec = importlib.util.spec_from_file_location(
            alias, oslib.path.join(oslib.path.dirname(__file__), "..",
                                   "tools", f"{name}.py"),
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod

    export_serving = _load_tool("export_serving", "export_serving_tok")
    serve_artifact = _load_tool("serve_artifact", "serve_artifact_tok")

    vdir = tmp_path / "vocab"
    vdir.mkdir()
    (vdir / "vocab.json").write_text(jsonlib.dumps({"a": 0}))
    (vdir / "merges.txt").write_text("#version\n")

    _, _, config = served
    config2 = config.replace(tokenizer_vocab_path=str(vdir))
    from prcv2025reid_tpu.models.reid_model import MultiModalReIDModel

    model = MultiModalReIDModel(config=config2, num_classes=3)
    variables = _fixture_variables()
    bdir = tmp_path / "bundle"
    manifest = export_serving.write_bundle(
        str(bdir), config2, model, variables, 2,
        graphs=["gallery_vis"], platforms=("cpu",),
    )
    assert manifest["config"]["tokenizer"] == "tokenizer"
    assert (bdir / "tokenizer" / "vocab.json").exists()
    assert (bdir / "tokenizer" / "merges.txt").exists()
    shim, _ = serve_artifact.load_bundle(str(bdir))
    assert shim.tokenizer_vocab_path == str(bdir / "tokenizer")
    # a vocab-less checkpoint (the smoke/test config) records null
    manifest2 = export_serving.write_bundle(
        str(tmp_path / "b2"), config, model, variables, 2,
        graphs=["gallery_vis"], platforms=("cpu",),
    )
    assert manifest2["config"]["tokenizer"] is None


def test_search_rerank_reaches_every_row_small_gallery():
    """Regression: the re-ranked /search candidate count used the FLOOR
    power of two when the gallery was smaller than top_n, making up to
    half the enrolled rows permanently unreachable (5 enrolled ids ->
    only 4 candidates).  Ceiling + invalid-slot masking: every live row
    retrievable, full result set, padded slots never surface."""
    import serve_embed

    rng = np.random.default_rng(3)
    f = rng.standard_normal((5, 8)).astype(np.float32)
    f /= np.linalg.norm(f, axis=1, keepdims=True)
    store = serve_embed.GalleryStore(
        8, f, [f"g{i}" for i in range(5)], min_capacity=4
    )
    rr = {"top_n": 100, "k1": 3, "k2": 2, "lam": 0.3}
    res = store.search(f, 5, rerank=rr)
    assert all(len(r) == 5 for r in res)
    for i, r in enumerate(res):
        assert r[0]["id"] == f"g{i}"  # the row itself is retrievable
        assert {e["id"] for e in r} == {f"g{j}" for j in range(5)}
        assert all(np.isfinite(e["score"]) for e in r)


def test_gallery_incremental_publish_matches_rebuild():
    """Adds at constant capacity go through the incremental device-update
    path (O(new rows) transfer); its published buffer must be
    byte-identical to a from-scratch rebuild, across appends, capacity
    growth, and removal."""
    import serve_embed

    rng = np.random.default_rng(7)
    f = rng.standard_normal((13, 8)).astype(np.float32)
    f /= np.linalg.norm(f, axis=1, keepdims=True)
    store = serve_embed.GalleryStore(8, min_capacity=8)
    for chunk in (f[:3], f[3:4], f[4:8], f[8:]):  # 3+1+4 stay at cap 8
        start = store.size
        store.add(chunk, [f"g{start + j}" for j in range(len(chunk))])
        ref = serve_embed.GalleryStore(
            8, f[: store.size], [f"g{j}" for j in range(store.size)],
            min_capacity=8,
        )
        assert store.capacity == ref.capacity
        np.testing.assert_array_equal(
            np.asarray(store._snap[0]), np.asarray(ref._snap[0])
        )
    assert store.remove(["g0"]) == 1  # removal takes the rebuild path
    res = store.search(f[[12]], 12, rerank={"top_n": 100, "k1": 4, "k2": 2,
                                            "lam": 0.3})
    assert res[0][0]["id"] == "g12" and len(res[0]) == 12


def test_search_rejects_boolean_top_k(search_served):
    """JSON true is an int subclass — it must 400, not mean top_k=1."""
    surl, _, feats = search_served
    code, body = _post(surl + "/search", {"texts": ["x"], "top_k": True})
    assert code == 400 and "top_k" in body["error"]


def test_search_shapes_are_bucketed(monkeypatch):
    """The jitted ranking sees power-of-two (batch, k) buckets only — novel
    compiles are remote and slow here (CLAUDE.md), so per-request shapes
    must never leak into the graph."""
    import serve_embed

    rng = np.random.default_rng(1)
    f = rng.standard_normal((9, 8)).astype(np.float32)
    f /= np.linalg.norm(f, axis=1, keepdims=True)
    store = serve_embed.GalleryStore(8, feats=f, ids=[str(i) for i in range(9)],
                                     min_capacity=4)

    real = serve_embed._topk_fn()
    shapes = []

    def spy(q, g, nvalid, k):
        shapes.append((int(q.shape[0]), int(k)))
        return real(q, g, nvalid, k)

    monkeypatch.setattr(serve_embed, "_topk_fn", lambda: spy)
    for nq in (1, 2, 3, 5, 7):
        for k in (1, 3, 5, 6):
            res = store.search(f[:nq], k)
            assert len(res) == nq and all(len(r) == k for r in res)
            # every query's best match is itself (unit rows, distinct ids)
            for i, r in enumerate(res):
                assert r[0]["id"] == str(i)
    assert all(
        b & (b - 1) == 0 and kk & (kk - 1) == 0 for b, kk in shapes
    ), shapes
    # O(log^2) buckets — the (batch, k) pairs collapse to power-of-two
    # products, never one graph per request shape (20 calls here)
    assert len(set(shapes)) <= 12


def test_gallery_enrollment_http(served, tmp_path_factory):
    """Runtime enrollment lifecycle over HTTP: start EMPTY, /gallery/add
    through the embedding engine, /search finds enrolled ids,
    /gallery/remove, /gallery/save persists to the server-side path."""
    import serve_embed

    url, engine, config = served
    gpath = tmp_path_factory.mktemp("enroll") / "enrolled.npz"
    gallery = serve_embed.GalleryStore(config.fusion_dim, path=str(gpath))
    srv = serve_embed.make_server(0, "127.0.0.1", config, engine,
                                  gallery=gallery)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    surl = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        # empty gallery: /search answers with empty rows, not an error
        code, body = _post(surl + "/search", {"texts": ["x"], "top_k": 3})
        assert code == 200 and body["results"] == [[]]

        # enroll 3 nir images (lossless PNG so a self-query matches exactly)
        pngs = []
        for i in range(3):
            img = Image.fromarray(
                (np.random.default_rng(100 + i).random((48, 32, 3)) * 255
                 ).astype(np.uint8))
            buf = io.BytesIO()
            img.save(buf, "PNG")
            pngs.append(base64.b64encode(buf.getvalue()).decode())
        code, body = _post(surl + "/gallery/add",
                           {"images_b64": pngs, "modality": "nir",
                            "ids": ["p0", "p1", "p2"]})
        assert code == 200
        assert body == {"added": 3, "gallery_size": 3}

        # self-query through /search: top-1 is the enrolled id, score ~1
        code, body = _post(surl + "/search",
                           {"images_b64": [pngs[1]], "modality": "nir",
                            "top_k": 2})
        assert code == 200
        assert body["results"][0][0]["id"] == "p1"
        assert body["results"][0][0]["score"] == pytest.approx(1.0, abs=1e-3)

        code, body = _post(surl + "/gallery/remove", {"ids": ["p1"]})
        assert code == 200 and body == {"removed": 1, "gallery_size": 2}
        code, body = _post(surl + "/search",
                           {"images_b64": [pngs[1]], "modality": "nir",
                            "top_k": 2})
        assert "p1" not in [e["id"] for e in body["results"][0]]

        # row-count mismatch and malformed ids are clean 400s
        code, body = _post(surl + "/gallery/add",
                           {"images_b64": pngs, "modality": "nir",
                            "ids": ["onlyone"]})
        assert code == 400 and "ids" in body["error"]
        code, body = _post(surl + "/gallery/remove", {"ids": "p0"})
        assert code == 400 and "list" in body["error"]
        # clients must not choose the save path (arbitrary-write hazard)
        code, body = _post(surl + "/gallery/save", {"path": "/tmp/evil"})
        assert code == 400 and "server-side" in body["error"]

        # rerank opt-in on a server built without rerank params is a 400
        code, body = _post(surl + "/search", {"texts": ["x"],
                                              "rerank": True})
        assert code == 400 and "search_rerank" in body["error"]

        # save persists to the --serve_gallery path; reload agrees
        code, body = _post(surl + "/gallery/save", {})
        assert code == 200 and body["gallery_size"] == 2
        feats, ids = serve_embed.load_gallery(str(gpath))
        assert sorted(ids) == ["p0", "p2"]
        assert feats.shape == (2, config.fusion_dim)

        # health reflects the live gallery size
        with urllib.request.urlopen(surl + "/healthz", timeout=30) as r:
            assert json.loads(r.read())["gallery_size"] == 2
    finally:
        srv.shutdown()
        srv.server_close()


def test_search_accepts_combo_queries(search_served):
    surl, imgs, feats = search_served
    buf = io.BytesIO()
    imgs[1].save(buf, "PNG")  # lossless: nir-only combo == gallery feature
    b64 = base64.b64encode(buf.getvalue()).decode()
    code, body = _post(
        surl + "/search",
        {"queries": [{"nir": b64}, {"nir": b64, "text": "a person"}],
         "top_k": 2},
    )
    assert code == 200 and body["count"] == 2
    # nir-only query IS gallery image 1 -> exact self-match through the
    # combo-graph path too
    assert body["results"][0][0]["id"] == "g1"
    assert body["results"][0][0]["score"] == pytest.approx(1.0, abs=1e-3)
    for row in body["results"]:
        scores = [e["score"] for e in row]
        assert scores == sorted(scores, reverse=True) and len(row) == 2
