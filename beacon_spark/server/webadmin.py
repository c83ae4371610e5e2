"""Static serving for the /admin SPA.

The admin web UI (the reference's ``/admin`` application,
``docs/docs/2.0.0-rc2/connect/web-admin-ui.md``) is a no-build-step
single-page app in ``clients/js/web`` that imports the dependency-free
JS SDK modules from ``clients/js/src`` directly — so the server maps:

    /admin                -> clients/js/web/index.html
    /admin/app.mjs|.css   -> clients/js/web/<file>
    /admin/src/<mod>.mjs  -> clients/js/src/<mod>.mjs

Only whitelisted names resolve (no path component ever comes from the
URL untrusted), mirroring the reference's embedded static bundle. The
assets carry no data — authentication happens in the browser against
``/api/admin/check`` and every API call the app makes is credentialed —
so they are served without transport auth, exactly like ``/console``.
"""

from __future__ import annotations

import os
import re

_WEB_FILES = {"index.html", "app.mjs", "app.css"}
_SRC_RE = re.compile(r"[a-z0-9-]+\.mjs\Z")

_CTYPES = {
    ".html": "text/html; charset=utf-8",
    ".mjs": "text/javascript; charset=utf-8",
    ".css": "text/css; charset=utf-8",
}

_MISSING = (b"<!doctype html><title>beacon-spark admin</title>"
            b"<p>The admin SPA assets (clients/js/web) are not present "
            b"in this installation.</p>")


def _root() -> str:
    """``clients/js`` next to the installed ``beacon_spark`` package."""
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    return os.path.join(os.path.dirname(here), "clients", "js")


def admin_asset(path: str) -> tuple[bytes, str] | None:
    """(body, content-type) for an ``/admin…`` URL path, or None when
    the path is not an admin asset route (the caller 404s)."""
    if path in ("/admin", "/admin/"):
        name = os.path.join(_root(), "web", "index.html")
        ctype = _CTYPES[".html"]
    elif path.startswith("/admin/src/"):
        mod = path[len("/admin/src/"):]
        if not _SRC_RE.fullmatch(mod):
            return None
        name = os.path.join(_root(), "src", mod)
        ctype = _CTYPES[".mjs"]
    elif path.startswith("/admin/"):
        leaf = path[len("/admin/"):]
        if leaf not in _WEB_FILES:
            return None
        name = os.path.join(_root(), "web", leaf)
        ctype = _CTYPES[os.path.splitext(leaf)[1]]
    else:
        return None
    try:
        with open(name, "rb") as f:
            return f.read(), ctype
    except OSError:
        if path in ("/admin", "/admin/"):
            return _MISSING, _CTYPES[".html"]
        return None
