"""Static DOM-contract tests (VERDICT r3 next-round #6).

No browser or node exists in this image, so the frontend JS cannot be
*executed* — but its DOM contract is statically checkable: every element id
a page's scripts dereference must exist in that page's HTML, and the
data-attribute selectors the scripts query must have matching elements.
This is the layer the wire-contract tests (tests/test_wire_contract.py)
don't cover: they pin the JSON schema, this pins the document the JS
renders it into.

Also golden-tests a Python mirror of the playground's client-side video
frame classifier — thresholds parsed FROM the shipped JS so drift between
the mirror and the real code fails the test (reference analog:
/root/reference/platform/frontend/js/playground.js:296-344 — blank mean<20,
frozen mean |diff|<3.0, corrupted intensity-stddev>80).
"""

from __future__ import annotations

import os
import re

import numpy as np
import pytest

FRONTEND = os.path.join(os.path.dirname(__file__), "..", "fav_tpu", "frontend")

PAGES = ("index.html", "architecture.html", "playground.html")


def _read(name: str) -> str:
    with open(os.path.join(FRONTEND, name), encoding="utf-8") as f:
        return f.read()


def _scripts_of(page_html: str) -> list[str]:
    return re.findall(r'<script src="/js/([\w.-]+)"></script>', page_html)


def _page_ids(page_html: str) -> set[str]:
    return set(re.findall(r'\bid="([^"]+)"', page_html))


def _required_ids(js: str) -> set[str]:
    """Element ids the script DEREFERENCES directly (``$("x").y`` /
    ``getElementById("x").y``) — these throw at runtime if absent. Ids that
    are fetched into a variable first are treated as optional (the shipped
    JS null-guards those)."""
    direct = re.findall(r'\$\("([^"]+)"\)\s*\.', js)
    direct += re.findall(r'getElementById\("([^"]+)"\)\s*\.', js)
    return set(direct)


def _all_ids(js: str) -> set[str]:
    return set(re.findall(r'\$\("([^"]+)"\)', js)) | set(
        re.findall(r'getElementById\("([^"]+)"\)', js)
    )


def test_every_dereferenced_id_exists():
    """For each page: every id its scripts dereference without a null guard
    must exist in that page's HTML."""
    checked = 0
    for page in PAGES:
        html = _read(page)
        ids = _page_ids(html)
        for script in _scripts_of(html):
            js = _read(os.path.join("js", script))
            missing = _required_ids(js) - ids
            assert not missing, (
                f"{page} loads js/{script}, which dereferences missing "
                f"element ids: {sorted(missing)}"
            )
            checked += len(_required_ids(js))
    assert checked > 20  # the contract is non-trivial


def test_load_bearing_ids_present():
    """The dashboard's core elements (gauge, chart, metric grid, ML panel
    with the degraded badge, attribution panel) and the playground's
    (upload zone, charts, summary) exist — a hand-pinned floor under the
    automatic scan above, so a refactor to variable-then-guard access
    cannot silently drop a core element."""
    index = _page_ids(_read("index.html"))
    for eid in (
        "gauge", "chart", "camera-img", "conn", "error-bar",
        "m-status", "m-anomaly", "m-integral", "m-velocity", "m-debt",
        "m-coeff", "m-conflicts", "m-speed",
        "ml-panel", "ml-pred", "ml-conf", "ml-anom", "ml-set", "ml-mi",
        "ml-fdist", "ml-degraded",
        "ev-total", "ev-recovery", "ev-worst", "ev-causes",
        "noise", "brightness", "btn-reset", "btn-log",
    ):
        assert eid in index, f"index.html lost #{eid}"
    play = _page_ids(_read("playground.html"))
    for eid in ("pg-chart", "pg-conn", "pg-changes", "pg-blocked"):
        assert eid in play, f"playground.html lost #{eid}"


def test_data_attribute_selectors_resolve():
    """Scripts query elements by data attributes (mode buttons, scenario
    bar, view toggles, scroll-stack cards); each queried attribute must
    exist on at least one element of every page using that script."""
    contracts = {
        "app.js": ("data-vision", "data-source", "data-view", "data-scenario"),
        "playground.js": ("data-seq",),
        "scrollstack.js": (),  # selector is configurable; covered below
    }
    for page in PAGES:
        html = _read(page)
        for script in _scripts_of(html):
            for attr in contracts.get(script, ()):
                assert re.search(rf"\b{attr}=", html), (
                    f"{page} loads js/{script} but has no element with {attr}="
                )
    # scroll-stacked architecture cards: the class the script targets
    arch = _read("architecture.html")
    if "scrollstack.js" in _scripts_of(arch):
        assert re.search(r'class="[^"]*arch-card', arch), (
            "architecture.html lost the .arch-card elements scrollstack.js stacks"
        )


def test_ws_client_pages_point_at_served_endpoints():
    """Pages wiring TrustWebSocket must target endpoints the server routes
    (/ws, /ws/playground — serving/app.py create_app)."""
    app_js = _read(os.path.join("js", "app.js"))
    pg_js = _read(os.path.join("js", "playground.js"))
    assert "/ws" in app_js
    assert "/ws/playground" in pg_js


# ── Python mirror of the playground client-side frame classifier ──


def _js_thresholds() -> dict:
    """Parse the classifier thresholds out of the shipped JS so the mirror
    below cannot drift from the real code."""
    js = _read(os.path.join("js", "playground.js"))
    blank = re.search(r"mean\s*<\s*([\d.]+)\)\s*return \"VISION_BLANK\"", js)
    frozen = re.search(r"diff\s*/\s*n\s*<\s*([\d.]+)\)\s*return \"VISION_FROZEN\"", js)
    corrupt = re.search(r"std\s*>\s*([\d.]+)\)\s*return \"VISION_CORRUPTED\"", js)
    assert blank and frozen and corrupt, "playground.js classifier not found"
    return {
        "blank_mean": float(blank.group(1)),
        "frozen_diff": float(frozen.group(1)),
        "corrupt_std": float(corrupt.group(1)),
    }


def test_classifier_thresholds_match_reference():
    """The shipped thresholds are the reference's client analyzer constants
    (reference playground.js:296-344): blank mean<20, frozen diff<3.0,
    corrupted stddev>80."""
    t = _js_thresholds()
    assert t == {"blank_mean": 20.0, "frozen_diff": 3.0, "corrupt_std": 80.0}


def classify_py(rgba: np.ndarray, prev: np.ndarray | None, t: dict) -> str:
    """Python mirror of playground.js classify(): ITU-R 601 grayscale over
    RGBA bytes, priority BLANK > FROZEN > CORRUPTED > OK."""
    data = rgba.reshape(-1, 4).astype(np.float64)
    gray = 0.299 * data[:, 0] + 0.587 * data[:, 1] + 0.114 * data[:, 2]
    mean = gray.mean()
    std = np.sqrt(max(0.0, (gray**2).mean() - mean**2))
    if mean < t["blank_mean"]:
        return "VISION_BLANK"
    if prev is not None:
        pdata = prev.reshape(-1, 4).astype(np.float64)
        pgray = 0.299 * pdata[:, 0] + 0.587 * pdata[:, 1] + 0.114 * pdata[:, 2]
        if np.abs(gray - pgray).mean() < t["frozen_diff"]:
            return "VISION_FROZEN"
    if std > t["corrupt_std"]:
        return "VISION_CORRUPTED"
    return "VISION_OK"


def rle_events_py(classes: list[str], step: int) -> list[dict]:
    """Mirror of the JS run-length encoder: consecutive same-status samples
    merge, each sample worth ``step`` frames."""
    events: list[dict] = []
    for c in classes:
        if events and events[-1]["status"] == c:
            events[-1]["frames"] += step
        else:
            events.append({"status": c, "noise": 0.0, "brightness": 0.5, "frames": step})
    return events


def _rgba(gray_img: np.ndarray) -> np.ndarray:
    """HxW grayscale [0,255] -> flat RGBA byte buffer (alpha 255)."""
    g = gray_img.astype(np.uint8)
    return np.stack([g, g, g, np.full_like(g, 255)], axis=-1).ravel()


def test_classifier_mirror_goldens():
    """Golden behavior of the threshold rules on synthetic frames."""
    t = _js_thresholds()
    rng = np.random.default_rng(0)
    h = w = 128

    dark = _rgba(np.full((h, w), 5))
    # mid-gray + strong texture: mean ~128, std safely above 80
    noisy = _rgba(rng.choice([20, 236], size=(h, w)).astype(np.uint8))
    flat = _rgba(np.full((h, w), 128))
    textured = _rgba(
        np.clip(128 + 40 * np.sin(np.arange(h * w) / 7.0), 0, 255).reshape(h, w)
    )

    assert classify_py(dark, None, t) == "VISION_BLANK"
    # blank dominates even when the previous frame was identical
    assert classify_py(dark, dark, t) == "VISION_BLANK"
    assert classify_py(noisy, None, t) == "VISION_CORRUPTED"
    # identical consecutive frames freeze (diff = 0 < 3)
    assert classify_py(textured, textured, t) == "VISION_FROZEN"
    # freeze outranks corruption for a static noisy frame
    assert classify_py(noisy, noisy, t) == "VISION_FROZEN"
    assert classify_py(flat, None, t) == "VISION_OK"
    # a moving textured frame vs a different previous frame: OK
    assert classify_py(textured, noisy, t) == "VISION_OK"
    # boundary: mean exactly at the threshold is NOT blank (strict <)
    at_thresh = _rgba(np.full((h, w), int(t["blank_mean"])))
    assert classify_py(at_thresh, None, t) == "VISION_OK"


def test_rle_mirror_golden():
    events = rle_events_py(
        ["VISION_OK", "VISION_OK", "VISION_BLANK", "VISION_BLANK",
         "VISION_BLANK", "VISION_OK"], step=10,
    )
    assert events == [
        {"status": "VISION_OK", "noise": 0.0, "brightness": 0.5, "frames": 20},
        {"status": "VISION_BLANK", "noise": 0.0, "brightness": 0.5, "frames": 30},
        {"status": "VISION_OK", "noise": 0.0, "brightness": 0.5, "frames": 10},
    ]


def test_rle_events_feed_playground_engine():
    """End of the client-side chain: the RLE events are valid input for the
    server's playground replay (the exact payload the JS posts to
    /ws/playground)."""
    from fav_tpu.serving.app import run_playground_sequence

    events = rle_events_py(
        ["VISION_OK"] * 3 + ["VISION_BLANK"] * 2 + ["VISION_OK"] * 2, step=3
    )
    results = run_playground_sequence(events)
    assert len(results) == 21  # 7 samples x 3 frames
    # the blank stretch must drag reliability down mid-sequence
    mid = results[14]["reliability"]
    assert mid < results[8]["reliability"]
