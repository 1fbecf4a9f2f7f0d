"""MLlib model persistence — the load-or-train cache surface (M8/M9).

The reference caches its 16 trained models + scaler + metrics as pickles and
serves from the cache when present (``Website/market/dunnhumby/
ml_models.py:101-214``; the ``has_cached_models`` check at
``ml_models.py:197-210``, with a ``force_retrain`` override) — without it
every session refits. Spark-first, the artifact is the whole
``PipelineModel`` (assembler + scaler + classifier serialize as ONE
directory via ``model.write().save()`` — SURVEY §3.3), plus a
``metrics.json`` sidecar mirroring the reference's cached metrics dict.

Cache key = ``name`` (model identity: kind + horizon) × ``data_version``
(a fingerprint of the training inputs: realpath'd sf_dir plus size + mtime
of every source file). Data rewritten on disk changes the version, so
staleness is detected automatically — no manual invalidation step, and no
way to serve a model trained on different data. Writes go through a
temp-dir + ``os.replace`` rename so a concurrent reader never observes a
half-written model.

This implementation is LOCAL-FILESYSTEM ONLY: the existence checks,
sidecar writes and the atomic staging rename all use ``os``/``shutil``.
``PipelineModel.save/load`` themselves speak any Hadoop filesystem, so a
shared-storage deployment replaces exactly those local calls with their
``FileSystem`` twins (exists / create / rename) — ``model_cache_root``
rejects remote URIs loudly rather than half-working (the model directory
would land on HDFS while the sidecar and rename silently hit a literal
local ``hdfs:`` folder, so the cache would never hit).
"""

from __future__ import annotations

import glob
import hashlib
import json
import os
import shutil
import tempfile
import uuid
from collections.abc import Callable

from pyspark.ml import PipelineModel


def model_cache_root() -> str:
    """Cache root — override with SPARK_GRAFT_MODEL_DIR. Must be a local
    path (see the module docstring); remote URIs fail fast here instead of
    silently splitting artifacts across two filesystems."""
    root = os.environ.get(
        "SPARK_GRAFT_MODEL_DIR", os.path.join(tempfile.gettempdir(), "mdmp_model_cache")
    )
    if "://" in root:
        raise NotImplementedError(
            f"SPARK_GRAFT_MODEL_DIR={root!r}: this cache's sidecar/rename layer "
            "is local-fs only; mount shared storage locally or port the os/"
            "shutil calls to the Hadoop FileSystem API"
        )
    return root


def data_version(sf_dir: str, tables: tuple[str, ...] = ("lineitem", "orders", "part")) -> str:
    """Fingerprint of the training inputs: realpath + (path, size, mtime) of
    every file of every source table the model trains on. Any rewrite of the
    data produces a new version → a new cache key → retraining, which is the
    invalidation contract (the reference's cache has no such guard — it
    serves stale models after a re-import until force_retrain)."""
    h = hashlib.md5()
    h.update(os.path.realpath(sf_dir).encode())
    for t in tables:
        p = os.path.join(sf_dir, f"{t}.parquet")
        files = (
            sorted(glob.glob(os.path.join(glob.escape(p), "**", "*"), recursive=True))
            if os.path.isdir(p)
            else [p]
        )
        for f in files:
            if os.path.isfile(f):
                st = os.stat(f)
                h.update(f"{f}:{st.st_size}:{st.st_mtime_ns}".encode())
    return h.hexdigest()[:16]


def model_dir(name: str, version: str) -> str:
    return os.path.join(model_cache_root(), f"{name}-{version}")


def atomic_publish(staging: str, final: str, overwrite: bool) -> None:
    """Publish a fully-written staging directory to its final path — THE
    one rename dance every cache here uses (models, metrics artifacts,
    persisted derived tables, recommendation-cache slots), so the
    concurrency contract lives in one place.

    ``overwrite=False`` (content-addressed caches, where ``final`` is keyed
    by its inputs' version and can only ever exist COMPLETE): plain
    ``os.replace``; losing the rename race to a concurrent builder means
    their input-identical artifact is already in place — adopt it, delete
    our staging. No pre-delete, so a reader of the winner never sees files
    vanish.

    ``overwrite=True`` (force-retrain semantics): delete-then-rename,
    last-wins; a concurrent reader of the old artifact can observe the
    swap — the documented force trade-off.
    """
    if overwrite:
        # the pre-delete must FAIL LOUDLY on real errors (EACCES, a file
        # where a dir is expected): with ignore_errors the subsequent
        # rename would fail against the surviving old artifact, the
        # adopt-the-winner branch would then delete OUR staging, and a
        # force-publish would silently keep the stale artifact. Only a
        # concurrent deleter's FileNotFoundError is benign.
        try:
            shutil.rmtree(final)
        except FileNotFoundError:
            pass
        try:
            os.replace(staging, final)
        except OSError:
            # adopt-the-winner is only valid if a winner actually exists: an
            # unrelated rename failure (EXDEV across mounts, EACCES) after
            # final was already deleted must re-raise — checked BEFORE the
            # staging delete so this function never destroys the only copy
            # (whether a caller keeps its staging on failure is its choice)
            if not os.path.isdir(final):
                raise
            shutil.rmtree(staging, ignore_errors=True)  # concurrent writer won
        return
    try:
        os.replace(staging, final)
    except OSError:  # first-wins: the winner's artifact is input-identical
        if not os.path.isdir(final):  # no winner ⇒ the failure was real
            raise
        shutil.rmtree(staging, ignore_errors=True)


def publish_staged(final: str, write: Callable[[str], None], overwrite: bool) -> str:
    """The ONE staging-dir publication dance every cross-process artifact
    performs around :func:`atomic_publish`: create a unique sibling staging
    dir, let ``write(staging)`` fill it, publish atomically, remove the
    staging on ANY failure. save_model / save_metrics_artifact /
    materialize.derived_table / the recommendation cache all route through
    here so the concurrency-critical cleanup contract (staging suffix,
    exist_ok create, BaseException rm) cannot drift between four copies."""
    staging = f"{final}.tmp-{uuid.uuid4().hex[:8]}"
    os.makedirs(staging, exist_ok=True)
    try:
        write(staging)
        atomic_publish(staging, final, overwrite=overwrite)
    except BaseException:
        shutil.rmtree(staging, ignore_errors=True)
        raise
    return final


#: (realpath, tables) -> (quick signature, version). ONE entry per table
#: set — the signature lives in the VALUE (compare-and-refresh), so N
#: rewrites over a long-lived process never accumulate N dead entries.
_DATA_VERSION_MEMO: dict[tuple, tuple] = {}


def _quick_table_sig(sf_dir: str, tables: tuple[str, ...]) -> tuple:
    """Staleness probe for the memo: (size, mtime_ns) of each table's
    top-level parquet entry PLUS, for directory datasets, one level of
    child entries — so both a wholesale replace and a partition-level
    rewrite (dynamic partition overwrite of one ``date=…/`` subdirectory,
    which leaves the dataset directory's own mtime untouched on POSIX but
    updates the partition directory's) change the signature and force a
    full re-fingerprint. Cost is O(|tables| + top-level partitions) stats
    per call — cheap next to the recursive walk it guards. Residual: a
    rewrite two levels down that somehow preserves every level-1 entry's
    mtime slips past; replacing any file updates its parent directory's
    mtime, so that requires deliberately back-dating — and the full
    :func:`data_version` still catches it across processes."""
    sig = []
    for t in tables:
        p = os.path.join(sf_dir, f"{t}.parquet")
        try:
            st = os.stat(p)
            sig.append((t, st.st_size, st.st_mtime_ns))
            if os.path.isdir(p):
                with os.scandir(p) as it:
                    for entry in sorted(it, key=lambda e: e.name):
                        est = entry.stat()
                        sig.append((entry.name, est.st_size, est.st_mtime_ns))
        except FileNotFoundError:
            sig.append((t, -1, -1))
    return tuple(sig)


def data_version_cached(sf_dir: str, tables: tuple[str, ...] = ("lineitem", "orders", "part")) -> str:
    """Memoized :func:`data_version` — for fast paths that would otherwise
    re-stat every source file on every call. The memo key includes a cheap
    per-table (size, mtime) signature (:func:`_quick_table_sig`), so a
    mid-process data rewrite invalidates the memo instead of serving a
    stale fingerprint — a handful of stats per call, versus the full
    recursive walk only when the signature moves."""
    key = (os.path.realpath(sf_dir), tables)
    sig = _quick_table_sig(sf_dir, tables)
    hit = _DATA_VERSION_MEMO.get(key)
    if hit is not None and hit[0] == sig:
        return hit[1]
    v = data_version(sf_dir, tables)
    _DATA_VERSION_MEMO[key] = (sig, v)
    return v


def has_cached_model(name: str, version: str) -> bool:
    """The reference's ``has_cached_models`` check (ml_models.py:197-210):
    a usable artifact is a completed save — metrics sidecar present (it is
    written into the temp dir before the atomic rename, so its presence at
    the final path implies the model directory is complete)."""
    d = model_dir(name, version)
    return os.path.isfile(os.path.join(d, "metrics.json")) and os.path.isdir(
        os.path.join(d, "model")
    )


def has_cached_models(names: list[str], version: str) -> bool:
    """Plural form of the reference's ``has_cached_models`` check
    (ml_models.py:197-210 requires every model of the grid to be present
    before serving from cache): True only when ALL named artifacts exist for
    this data version."""
    return all(has_cached_model(n, version) for n in names)


def save_model(model: PipelineModel, metrics: dict[str, float], name: str, version: str) -> str:
    """Persist model + metrics sidecar atomically; returns the final dir."""

    def write(staging: str) -> None:
        model.write().overwrite().save(os.path.join(staging, "model"))
        with open(os.path.join(staging, "metrics.json"), "w") as fh:
            json.dump(metrics, fh, sort_keys=True)

    # overwrite=True: save_model is also the force-retrain path, so a
    # newer artifact must replace an existing same-version one
    return publish_staged(model_dir(name, version), write, overwrite=True)


def load_model(name: str, version: str) -> tuple[PipelineModel, dict[str, float]]:
    d = model_dir(name, version)
    with open(os.path.join(d, "metrics.json")) as fh:
        metrics = json.load(fh)
    return PipelineModel.load(os.path.join(d, "model")), metrics


def save_metrics_artifact(name: str, version: str, payload: dict) -> str:
    """Persist a metrics-only artifact (no PipelineModel) — the cached
    metrics surface the reference's training-status API serves without
    refitting (``ml_models.py:583-594`` polled via ``views.py:3119-3127``).
    Used for the 16-cell horizon grid, whose catalog output is the metrics
    table itself: the serving *model* persists separately via
    ``load_or_train`` and the grid's job is the surface, so caching the
    JSON avoids paying 16 model writes for artifacts nothing loads.
    Same atomic staging-rename contract as ``save_model``."""

    def write(staging: str) -> None:
        with open(os.path.join(staging, "metrics.json"), "w") as fh:
            json.dump(payload, fh, sort_keys=True)

    return publish_staged(model_dir(name, version), write, overwrite=True)


def has_cached_metrics_artifact(name: str, version: str) -> bool:
    return os.path.isfile(os.path.join(model_dir(name, version), "metrics.json"))


def load_metrics_artifact(name: str, version: str) -> dict:
    with open(os.path.join(model_dir(name, version), "metrics.json")) as fh:
        return json.load(fh)


def load_or_train(
    name: str,
    version: str,
    train_fn: Callable[[], "object"],
    force: bool = False,
) -> tuple[PipelineModel, dict[str, float], bool]:
    """Serve from cache when a (name, version) artifact exists, else train
    via ``train_fn`` (returning ``pipelines.TrainedModel``) and persist.
    Returns (model, metrics, from_cache). ``force=True`` mirrors the
    reference's force_retrain flag: always refit and overwrite."""
    if not force and has_cached_model(name, version):
        model, metrics = load_model(name, version)
        return model, metrics, True
    trained = train_fn()
    save_model(trained.model, trained.metrics, name, version)
    return trained.model, trained.metrics, False
