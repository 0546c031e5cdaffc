"""Per-user cache directory for compiled native helpers (.so files).

The previous scheme cached compiled bridges in a world-shared
``/tmp/ert_native``: another local user could pre-create that directory
and plant a newer .so that passes the mtime freshness check and gets
ctypes-loaded into the process (advisor finding, round 4). The cache now
lives under ``$XDG_CACHE_HOME/ert_native`` (default ``~/.cache/ert_native``),
falling back to a uid-suffixed tempdir, created 0700, and verified to be
owned by the current uid and not group/world-writable before anything is
loaded from it.
"""

from __future__ import annotations

import os
import stat
import tempfile


def native_cache_dir() -> str:
    """Create (if needed) and validate the per-user native build cache."""
    base = os.environ.get("XDG_CACHE_HOME", "")
    if not base:
        home = os.path.expanduser("~")
        if home and home != "~":
            base = os.path.join(home, ".cache")
    if base:
        path = os.path.join(base, "ert_native")
    else:
        path = os.path.join(tempfile.gettempdir(),
                            f"ert_native_{os.getuid()}")
    os.makedirs(path, mode=0o700, exist_ok=True)
    st = os.stat(path)
    if st.st_uid != os.getuid() or (st.st_mode & (stat.S_IWGRP | stat.S_IWOTH)):
        raise RuntimeError(
            f"native cache dir {path} is owned by uid {st.st_uid} or "
            "group/world-writable; refusing to load libraries from it")
    return path
