"""URL normalization — reference S4 semantics
(dto/indexing/PageAnalyzer.java:47-82):

* strip the query string (``?...``) and fragments
* lowercase
* make the path site-root-relative with a leading ``/``
* drop a trailing ``/`` (except the bare root, which stays ``/``)
* reject cross-site URLs (return None)

Pure-Python reference implementation; the Spark layer uses equivalent
column expressions (functions/text_columns.py: normalized_path_col).
"""

from __future__ import annotations


def normalize_path(site_root: str, url: str) -> str | None:
    """Return the normalized site-relative path, or None if the URL does not
    belong to ``site_root``."""
    if url is None:
        return None
    u = url.strip().lower()
    root = site_root.strip().lower().rstrip("/")
    for sep in ("#", "?"):
        i = u.find(sep)
        if i >= 0:
            u = u[:i]
    if u.startswith(root):
        path = u[len(root):]
    elif u.startswith("/"):
        path = u
    else:
        return None
    if not path:
        return "/"
    if not path.startswith("/"):
        return None
    if len(path) > 1 and path.endswith("/"):
        path = path.rstrip("/") or "/"
    return path
