"""General runtime utilities.

Rebuild of the reference dnnlib/util + forger util helpers
(thirdparty/.../dnnlib/util.py, forger/util/logging.py, forger/util/timer.py):
EasyDict, class construction from config strings, tee'd logging, wall-clock
timing, and tensor stat logging.
"""

from __future__ import annotations

import importlib
import logging
import sys
import time
from typing import Any, Optional

import numpy as np


def commit_to_default_device(tree):
    """Commit a pytree of weights to the session's default device.

    ``jax.device_put(tree)`` with no target respects existing commitment:
    arrays created under ``jax.default_device(cpu)`` (a common recipe —
    parameter init is latency-bound on a tunneled accelerator) stay
    CPU-committed, and every later dispatch re-stages the full weight set
    host->device (~1.3 s/stroke measured over the dev tunnel).  This helper
    pins to an explicit device so weights are resident regardless of where
    the caller materialised them: the configured ``jax.default_device`` if
    one is active, else the first platform device.
    """
    import jax
    dev = getattr(jax.config, "jax_default_device", None) or jax.devices()[0]
    return jax.device_put(tree, dev)


def tree_on_stale_backend(tree) -> bool:
    """True if any committed leaf lives on a torn-down backend.

    ``jax.extend.backend.clear_backends()`` (used by the multichip dryrun
    bootstrap and by host-device reconfiguration) invalidates every
    existing ``jax.Array``: its device object belongs to the dead client
    and mixing it with fresh arrays raises "incompatible devices" even
    though both print as device 0.  Module-level weight caches (FID /
    LPIPS detectors) must rebuild when this happens.
    """
    import jax
    leaves = [x for x in jax.tree_util.tree_leaves(tree)
              if isinstance(x, jax.Array)]
    if not leaves:
        return False
    live = set(jax.devices())
    try:
        return any(not (x.devices() <= live) for x in leaves)
    except Exception:
        return True


class EasyDict(dict):
    """Attribute-access dict (reference dnnlib.util.EasyDict)."""

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError:
            raise AttributeError(name)

    def __setattr__(self, name, value):
        self[name] = value

    def __delattr__(self, name):
        del self[name]


def get_obj_by_name(name: str) -> Any:
    """'pkg.module.attr' -> object (reference construct_class_by_name infra)."""
    module_name, _, attr = name.rpartition(".")
    module = importlib.import_module(module_name)
    return getattr(module, attr)


def construct_class_by_name(*args, class_name: str, **kwargs) -> Any:
    """String-based dependency injection (reference dnnlib util)."""
    return get_obj_by_name(class_name)(*args, **kwargs)


def format_time(seconds: float) -> str:
    s = int(round(seconds))
    if s < 60:
        return f"{s}s"
    if s < 3600:
        return f"{s // 60}m {s % 60:02d}s"
    if s < 86400:
        return f"{s // 3600}h {(s % 3600) // 60:02d}m"
    return f"{s // 86400}d {(s % 86400) // 3600:02d}h"


class Timer:
    """Simple wall-clock timer (reference forger/util/timer.py)."""

    def __init__(self):
        self.start_time = time.time()

    def tick(self) -> float:
        now = time.time()
        elapsed = now - self.start_time
        self.start_time = now
        return elapsed

    def peek(self) -> float:
        return time.time() - self.start_time


class Logger:
    """Tee stdout/stderr to a file (reference dnnlib.util.Logger)."""

    def __init__(self, file_name: Optional[str] = None, mode: str = "w"):
        self.file = open(file_name, mode) if file_name else None
        self.stdout = sys.stdout
        sys.stdout = self

    def write(self, text):
        self.stdout.write(text)
        if self.file:
            self.file.write(text)

    def flush(self):
        self.stdout.flush()
        if self.file:
            self.file.flush()

    def close(self):
        sys.stdout = self.stdout
        if self.file:
            self.file.close()


def default_log_setup(level=logging.INFO):
    """Logging setup (reference forger/util/logging.py:19)."""
    logging.basicConfig(
        level=level,
        format="%(asctime)s|%(levelname)8s| %(message)s",
        handlers=[logging.StreamHandler(sys.stdout)])


def add_log_level_flag(parser):
    parser.add_argument("--log_level", type=int, default=logging.INFO,
                        help="Logging level (10 debug, 20 info, ...)")


def print_param_summary(params, name: str = "model", max_rows: int = 40):
    """Parameter-count summary table (reference misc.print_module_summary
    dry-forward analog for param pytrees)."""
    import jax
    rows = []
    total = 0
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    for path, leaf in flat:
        n = int(np.prod(np.asarray(leaf).shape)) if np.ndim(leaf) else 1
        total += n
        rows.append(("/".join(str(getattr(p, "key", p)) for p in path),
                     tuple(np.shape(leaf)), n))
    print(f"{name} parameters: {total:,}")
    for r in rows[:max_rows]:
        print(f"  {r[0]:<60s} {str(r[1]):<20s} {r[2]:,}")
    if len(rows) > max_rows:
        print(f"  ... ({len(rows) - max_rows} more tensors)")
    return total


def assert_shape(tensor, ref_shape):
    """Shape assertion with None wildcards (reference torch_utils/misc.py:80).

    ``ref_shape`` entries of None match any extent.  Works on jax/numpy
    arrays and traced values (uses the static .shape).
    """
    shape = tuple(tensor.shape)
    if len(shape) != len(ref_shape):
        raise AssertionError(
            f"Wrong number of dimensions: got {len(shape)}, "
            f"expected {len(ref_shape)}")
    for i, (size, ref) in enumerate(zip(shape, ref_shape)):
        if ref is not None and size != ref:
            raise AssertionError(
                f"Wrong size for dimension {i}: got {size}, expected {ref}")


def profiled_function(fn):
    """Annotate a function so device profiles group its ops under its name
    (reference torch_utils/misc.py:98 used torch.autograd.profiler;
    the JAX analog is a jax.named_scope around the traced body)."""
    import functools
    import jax

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        with jax.named_scope(fn.__name__):
            return fn(*args, **kwargs)
    return wrapper


def open_url(url: str, cache_dir: Optional[str] = None, mode: str = "rb"):
    """Open a URL or local path (reference dnnlib.util.open_url).

    This environment has no network egress, so only ``file://`` URLs and
    plain local paths are supported; http(s) URLs resolve through the
    cache directory (populated out-of-band) by hashed filename, and raise
    with a clear message when the artifact is absent.
    """
    import hashlib
    import os
    if url.startswith("file://"):
        return open(url[len("file://"):], mode)
    if not (url.startswith("http://") or url.startswith("https://")):
        return open(url, mode)
    cache_dir = cache_dir or os.environ.get(
        "BSE_CACHE_DIR", os.path.expanduser("~/.cache/brushstroke_engine"))
    digest = hashlib.sha256(url.encode()).hexdigest()[:16]
    base = os.path.basename(url.split("?")[0]) or "download"
    path = os.path.join(cache_dir, f"{digest}-{base}")
    if os.path.isfile(path):
        return open(path, mode)
    raise FileNotFoundError(
        f"No network egress: place the artifact for {url!r} at {path!r}")


def log_tensor(t, name: str, logger, level=logging.DEBUG,
               print_stats: bool = False):
    """Shape/stat logging (reference forger/util/logging.py:66)."""
    if not logger.isEnabledFor(level):
        return
    arr = np.asarray(t)
    msg = f"{name}: shape {arr.shape} dtype {arr.dtype}"
    if print_stats and arr.size:
        msg += (f" min {arr.min():.4f} max {arr.max():.4f} "
                f"mean {arr.mean():.4f}")
    logger.log(level, msg)
