"""Static consistency checks for the frontend JS (no JS runtime exists in
this environment — no node, no chrome — so i18n key drift and module
import/export drift would otherwise ship unguarded; these greps are the
regression net the browser can't provide here).

Covers the contract between frontend/i18n.js (reference UI strings:
reference frontend/public/index.html:321-365) and its three consumers
(app.js, realtime.js, file.js) plus index.html's data-i18n attributes.
"""

from __future__ import annotations

import re
from pathlib import Path

import pytest

FRONTEND = Path(__file__).resolve().parent.parent / "frontend"


def _read(name: str) -> str:
    return (FRONTEND / name).read_text(encoding="utf-8")


def _locale_tables() -> dict[str, set[str]]:
    """Parse the en/zh key sets out of the dict literal in i18n.js."""
    src = _read("i18n.js")
    tables: dict[str, set[str]] = {}
    for lang in ("en", "zh"):
        m = re.search(rf"\b{lang}:\s*\{{(.*?)\n  \}}", src, re.S)
        assert m, f"locale table {lang!r} not found in i18n.js"
        tables[lang] = set(re.findall(r"^\s{4}(\w+):", m.group(1), re.M))
    return tables


def _used_keys() -> set[str]:
    """Every i18n key referenced from JS (t('k'), own(el,'k')) or HTML
    (data-i18n / data-i18n-ph attributes)."""
    keys: set[str] = set()
    for name in ("app.js", "realtime.js", "file.js"):
        src = _read(name)
        keys |= set(re.findall(r"\bt\(\s*[\"']([\w-]+)[\"']", src))
        keys |= set(re.findall(r"\bown\(\s*[^,]+,\s*[\"']([\w-]+)[\"']", src))
        # statusKey("k") / statusKey(cond ? "a" : "b"): every quoted word
        # in the first-arg expression is an i18n key
        for m in re.finditer(r"\bstatusKey\(([^)]*)\)", src):
            first_arg = m.group(1).split(",")[0]  # 2nd arg is a css class
            keys |= set(re.findall(r"[\"']([\w-]+)[\"']", first_arg))
    html = _read("index.html")
    keys |= set(re.findall(r"data-i18n(?:-ph)?=\"([\w-]+)\"", html))
    return keys


def test_locale_tables_cover_same_keys():
    """en and zh must translate exactly the same key set — a key added to
    one table only silently falls back to English (or the raw key)."""
    tables = _locale_tables()
    assert tables["en"] == tables["zh"], (
        f"en-only: {sorted(tables['en'] - tables['zh'])}, "
        f"zh-only: {sorted(tables['zh'] - tables['en'])}"
    )


def test_every_used_key_exists():
    """Every t()/own()/data-i18n key in the UI must exist in the en table
    (t() falls back to the raw key, which would ship as visible text)."""
    missing = _used_keys() - _locale_tables()["en"]
    assert not missing, f"keys used but untranslated: {sorted(missing)}"


def test_no_orphan_translations():
    """Every translated key must be used somewhere — orphans are usually a
    renamed key whose call site kept the old name (the drifted call site
    then renders raw-key text)."""
    orphans = _locale_tables()["en"] - _used_keys()
    assert not orphans, f"translated but never used: {sorted(orphans)}"


def test_imports_match_i18n_exports():
    """Each consumer's `import { ... } from "/static/i18n.js"` names must
    all be exported by i18n.js (a typo here is a page-breaking module
    resolution error the test suite can't otherwise see)."""
    exports = set(
        re.findall(r"^export function (\w+)", _read("i18n.js"), re.M)
    )
    for name in ("app.js", "realtime.js", "file.js"):
        m = re.search(
            r"import \{([^}]*)\} from \"/static/i18n.js\"", _read(name)
        )
        assert m, f"{name} does not import i18n.js"
        imported = {
            p.split(" as ")[0].strip() for p in m.group(1).split(",") if p.strip()
        }
        missing = imported - exports
        assert not missing, f"{name} imports non-exported: {sorted(missing)}"


def test_dynamic_elements_are_released_or_rekeyed():
    """The two fixes this test pins: realtime's status line releases its
    data-i18n key before the runtime writes it, and the start button is
    re-keyed with own() (not bare textContent) so language toggles follow
    the live start/stop state instead of clobbering it."""
    rt = _read("realtime.js")
    status_fn = rt[rt.index("status(msg"):]
    assert "release(this.el.status)" in status_fn.split("}")[0] + "}", (
        "status() must release the status element before writing it"
    )
    assert re.search(r"own\(this\.el\.startBtn,\s*\"stop\"\)", rt)
    assert re.search(r"own\(this\.el\.startBtn,\s*\"start\"\)", rt)
    assert "release(this.el.area)" in _read("file.js"), (
        "file drop area must be released once it shows a chosen file name"
    )


def test_static_assets_served_by_app():
    """The aiohttp app must serve / and /static (else every frontend module
    above is dead code); stub engine/vad — only the route table matters."""
    pytest.importorskip("aiohttp")
    from sonicscribe_tpu.config import AppConfig
    from sonicscribe_tpu.serve.app import build_app

    app = build_app(AppConfig(), engine=object(), vad=object())
    routes = {r.resource.canonical for r in app.router.routes()}
    assert "/static" in routes and "/" in routes, routes
    # every module imported by the served page must exist on disk
    for name in ("app.js", "realtime.js", "file.js", "i18n.js",
                 "pcm-processor.js", "index.html"):
        assert (FRONTEND / name).is_file(), name
