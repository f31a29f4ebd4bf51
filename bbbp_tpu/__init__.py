"""bbbp_tpu — TPU-native multi-modal deep-ensemble framework for BBBP prediction.

A ground-up JAX/XLA/Pallas/pjit re-design of the capabilities of
FengDushuo/BBBP-Multi-Modal-Deep-Ensemble-Framework (see SURVEY.md):

- ``bbbp_tpu.chem``      SMILES parser, fingerprints (Morgan/path/MACCS-style),
                         2-D depiction — built from scratch (no RDKit in image),
                         with a threaded C++ fast path in ``bbbp_tpu.native``.
- ``bbbp_tpu.data``      B3DB dataset loaders, ZINC stream readers.
- ``bbbp_tpu.ops``       XLA feature-engineering ops: scaler, PCA, interaction
                         features, isolation forest, SMOTE-Tomek, metrics,
                         tensorized decision-forest engine, packed-bit unpack.
- ``bbbp_tpu.models``    Flax model zoo: dual-branch MLP, Transformer+CNN with
                         attention fusion, SMILES-BERT, flow-MLP, linear zoo.
- ``bbbp_tpu.train``     pjit training loops, K-fold/ensemble mesh parallelism,
                         stacking + voting pipelines.
- ``bbbp_tpu.parallel``  mesh construction, sharding rules, host→device prefetch.
- ``bbbp_tpu.pipelines`` CLI entry points mirroring the reference's scripts
                         (featurize / preprocess / train-classify / train-regress /
                         train-bert / screen).
- ``bbbp_tpu.reporting`` metrics CSVs, plots, attribution (integrated gradients,
                         exact TreeSHAP on the JAX forests).
"""

__version__ = "0.1.0"


def _prune_foreign_cache_entries(root: str, keep_tag: str) -> None:
    """One-time hygiene for the persistent compile cache (ADVICE r3):
    pre-namespacing jit_* entries stranded at the cache ROOT can never be
    served again (the cache dir now always points at a fingerprint subdir),
    and fingerprint subdirs from other host generations are unreachable by
    construction — with 10-40 min compiles these are large, so delete both
    instead of accumulating them across container migrations.

    Guarded by a per-tag marker file (ADVICE r4): the prune runs once per
    fingerprint CHANGE, not on every import — if the repo dir is ever shared
    by hosts of two CPU generations (network FS, side-by-side containers),
    an every-import purge would have each import wipe the other host's
    populated cache, repeatedly discarding 10-40 min remote compiles."""
    import os
    import shutil

    marker = os.path.join(root, f".pruned_for_{keep_tag}")
    if os.path.exists(marker):
        return
    try:
        for name in os.listdir(root):
            p = os.path.join(root, name)
            if os.path.isfile(p) and name.startswith("jit_"):
                os.unlink(p)
            elif os.path.isdir(p) and name not in (keep_tag, "device"):
                shutil.rmtree(p, ignore_errors=True)
        with open(marker, "w") as f:
            f.write("pruned\n")
    except OSError:
        pass


def _enable_persistent_compile_cache() -> None:
    """Point JAX's persistent compilation cache at a repo-local directory.

    Forest-family programs compile in 10–40 min over the remote-TPU tunnel
    (results/RESULTS.md infrastructure notes); without a persistent cache
    every process restart or crash-retry repays that. The cache key is the
    HLO hash, so code changes can never be served stale executables. Env
    ``JAX_COMPILATION_CACHE_DIR`` (or a pre-set config value) wins; backends
    that cannot serialize executables just skip the cache with a warning.
    """
    import os

    if os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        return  # explicit user choice
    try:
        import jax

        if jax.config.jax_compilation_cache_dir is None:
            # Namespace by a host-CPU fingerprint: XLA:CPU entries are AOT
            # machine code keyed by HLO hash only, so an entry compiled on a
            # host with different CPU features loads with a SIGILL-risk
            # warning after a container migration. A per-host-generation
            # subdirectory makes stale AOT code unreachable instead.
            # Fingerprint: x86 Linux hashes the /proc/cpuinfo "flags" line
            # (UNCHANGED from round 3 so existing populated caches keep
            # their tag); aarch64 calls the line "Features" and non-/proc
            # platforms fall back to platform.machine()/processor(), so
            # those hosts get distinct namespaces too instead of a shared
            # "host" dir (ADVICE r3).
            import hashlib
            import platform

            feat = ""
            try:
                with open("/proc/cpuinfo") as f:
                    for line in f:
                        if line.startswith(("flags", "Features")):
                            feat = line
                            break
            except OSError:
                pass
            if not feat.startswith("flags"):
                feat += f"|{platform.machine()}|{platform.processor()}"
            tag = hashlib.sha256(feat.encode()).hexdigest()[:12]
            root = os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), ".jax_cache")
            # The SIGILL concern above is specific to XLA:CPU AOT entries;
            # TPU executables are serialized device programs whose validity
            # does not depend on the HOST CPU generation. Namespacing them
            # by host fingerprint made every container migration discard
            # 10-40 min of remote forest compiles (observed live round 5:
            # a reboot onto a new host gen re-paid ~45 min). So: processes
            # pinned to the CPU backend (tests, virtual-mesh dryruns) use
            # the per-host-generation dir; everything else (axon/TPU, the
            # only processes that pay remote compiles) shares ".jax_cache/
            # device", which survives migrations and is never pruned.
            plat = os.environ.get(
                "JAX_PLATFORMS", "").split(",")[0].strip().lower()
            if plat == "cpu":
                cache_dir = os.path.join(root, tag)
                _prune_foreign_cache_entries(root, tag)
            else:
                cache_dir = os.path.join(root, "device")
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            # remote compiles are the pain point; cache anything nontrivial
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    except Exception:  # noqa: BLE001 — cache is an optimization, never fatal
        pass


def _honor_jax_platforms_env() -> None:
    """Make ``JAX_PLATFORMS`` from the environment actually win.

    The axon sitecustomize registers the TPU backend at interpreter start and
    (as of the current image) pins the live ``jax_platforms`` config to the
    tunnel backend, so ``JAX_PLATFORMS=cpu python …`` silently runs on the
    remote TPU anyway — contending with whatever job owns the tunnel. Tests
    already guard themselves (tests/conftest.py re-updates the live config);
    this makes every package entry point honor the env var the same way.
    """
    import os

    want = os.environ.get("JAX_PLATFORMS", "").strip().lower()
    if not want or want == "axon":
        return
    try:
        import jax

        if jax.config.jax_platforms != want:
            jax.config.update("jax_platforms", want)
    except Exception:  # noqa: BLE001 — never make importing the package fatal
        pass


_honor_jax_platforms_env()
_enable_persistent_compile_cache()
