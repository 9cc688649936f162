"""Stage-then-swap directory commits — shared by the streaming sinks
that publish partition directories atomically (rollup refresh, batch
compaction) and by the READERS of those stores, which must resolve a
mid-swap crash's leftovers before Spark's partition discovery sees a
`<dir>.old` / `<dir>.staging` as a bogus partition value.

Local-FS commit protocol by design: on HDFS/S3 this role is played by
a table format's transaction log (Delta/Iceberg) — the call sites are
the seams where that would plug in.
"""

from __future__ import annotations

import os
import shutil


def recover_dir_swap(ddir: str) -> None:
    """Crash recovery for the stage-then-swap commit: a prior run may
    have died mid-swap. If the live dir is gone but its renamed-aside
    copy survives, the swap never completed — restore the copy as the
    committed state. A leftover `.old` ALONGSIDE a live dir means the
    swap DID complete and only the cleanup was lost; drop it. Stale
    staging is always discarded."""
    retired, staging = ddir + ".old", ddir + ".staging"
    if os.path.exists(retired):
        if os.path.exists(ddir):
            shutil.rmtree(retired)
        else:
            os.replace(retired, ddir)
    if os.path.exists(staging):
        shutil.rmtree(staging)


def commit_dir_swap(ddir: str) -> None:
    """Commit `<ddir>.staging` as `<ddir>`: the old dir is renamed
    ASIDE, not rmtree'd, before the swap — so no crash window ever
    leaves the target with neither the old nor the new state on disk
    (`recover_dir_swap` resolves every intermediate state)."""
    retired = ddir + ".old"
    if os.path.exists(ddir):
        os.replace(ddir, retired)
    os.replace(ddir + ".staging", ddir)
    if os.path.exists(retired):
        shutil.rmtree(retired)


def recover_partition_swaps(root: str) -> None:
    """Reader-side sweep: resolve EVERY `*.old` / `*.staging` leftover
    under `root` before a parquet read — partition discovery would
    otherwise surface `dt=2024-01-01.old` as a (double-counting,
    type-degrading) partition value in the window between a mid-swap
    crash and the next writer run."""
    if not os.path.isdir(root):
        return
    for name in sorted(os.listdir(root)):
        base = None
        if name.endswith(".old"):
            base = name[: -len(".old")]
        elif name.endswith(".staging"):
            base = name[: -len(".staging")]
        if base is not None:
            recover_dir_swap(os.path.join(root, base))
