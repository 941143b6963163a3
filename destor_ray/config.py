"""Engine configuration.

Mirrors the reference's config grammar surface
(/root/reference/src/config.c:19-325) as dataclasses: chunking params,
sampling method/ratio, segmenting, index presets, LSH layout, rewrite
and restore-cache knobs. Named presets reproduce init_index's scheme
combos (/root/reference/src/index/index.c:28-126).
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import asdict, dataclass, field


@dataclass(frozen=True)
class ChunkingConfig:
    algorithm: str = "fastcdc"        # fixed|rabin|normalized_rabin|tttd|ae|fastcdc|file
    min_size: int = 512
    avg_size: int = 4096
    max_size: int = 65536


@dataclass(frozen=True)
class SamplingConfig:
    method: str = "min"               # min|optimized_min|random|uniform
    ratio: int = 32


@dataclass(frozen=True)
class LSHConfig:
    # caption MinHash-LSH
    shingle_k: int = 5                # char shingle width
    num_perms: int = 64
    num_bands: int = 8                # 8 bands × 4 rows (first 32 perms)
    rows_per_band: int = 4
    # phash Hamming bands (8 × 8 bits → catches hamming distance <= 7)
    phash_bands: int = 8
    # skew control: groups larger than this are salted/capped with logged drops
    max_band_group: int = 256
    # groups up to this size verify all pairs; larger → star+chain (linear)
    full_pair_cap: int = 32
    caption_jaccard_threshold: float = 0.55
    # suffix-array substring-fingerprint channel (functions/suffixes.py):
    # winnowing gram/window over the caption — detects shared exact
    # substrings >= gram + window - 1 chars (verbatim quotation /
    # template reuse) that shingle-set Jaccard under-weights
    substring_gram: int = 16
    substring_window: int = 9
    # destor-parity champion selection (similarity_detection.c:85-123):
    # 0 = off (exhaustive-within-cap verify, the default flagship path);
    # k > 0 = per query row, greedily pick the top-k candidates by
    # shared-feature count with feature trim between picks, and verify
    # only those pairs (candidate-COUNT parity with the reference)
    champion_top_k: int = 0
    # "inline" ships thumbs on every band row (one shuffle, default);
    # "rendezvous" ships 16 B band rows + attaches thumbs to the much
    # smaller candidate-pair table via two endpoint-keyed exchanges —
    # ~2.5x less shuffle volume at the 8-byte thumb, more at larger
    # thumbs; identical verified edges (stages/candidates.py)
    verify_mode: str = "inline"


@dataclass(frozen=True)
class VerifyConfig:
    thumb_size: int = 8
    psnr_threshold: float = 25.0      # thumbnail PSNR to accept an image pair
    sim_hamming_max: int = 9          # phash distance accepted in simulation mode
    # (9 rejects every planted distractor (ham>=10) but misses heavy-crop
    #  tails — simulation mode is an approximate metadata-path dry run,
    #  like destor's simulation levels, not the correctness path)
    cache_size: int = 4096            # per-actor LRU of representatives (D5 analog)
    batch_size: int = 1024
    concurrency: int = 4


@dataclass(frozen=True)
class RewriteConfig:
    enable: bool = False
    algorithm: str = "cap"            # cfl|cbr|cap|har
    cfl_require: float = 0.6          # rewrite_cfl_require analog
    cfl_usage_threshold: float = 0.03 # rewrite_cfl_usage_threshold analog
    cbr_limit: float = 0.05           # CBR rewrite limit (cbr_rewrite.c)
    cap_level: int = 16               # capping level (cap_rewrite.c)
    har_utilization: float = 0.5      # HAR sparse threshold (har_rewrite.c)
    har_rewrite_limit: float = 0.05   # HAR close_har trim limit (har_rewrite.c:87-168)
    window: int = 1024                # rewrite buffer size (rewrite_phase.c)


@dataclass(frozen=True)
class RestoreConfig:
    cache: str = "lru"                # lru|opt|asm
    cache_size: int = 30
    opt_window: int = 1024


@dataclass(frozen=True)
class EngineConfig:
    chunking: ChunkingConfig = field(default_factory=ChunkingConfig)
    sampling: SamplingConfig = field(default_factory=SamplingConfig)
    lsh: LSHConfig = field(default_factory=LSHConfig)
    verify: VerifyConfig = field(default_factory=VerifyConfig)
    rewrite: RewriteConfig = field(default_factory=RewriteConfig)
    restore: RestoreConfig = field(default_factory=RestoreConfig)
    container_rows: int = 4096        # rows per output "container" partition
    use_byte_cdc_channel: bool = True # destor-parity candidate channel over `bytes`
    # caption winnowing-fingerprint band channel (the north-star's
    # suffix-array substring signature); off by default — the four stock
    # channels already saturate recall on the planted plan, so this adds
    # band rows only when substring-level caption dup matters
    use_substring_channel: bool = False
    # simulation mode — destor's simulation levels analog (destor.h:55-59,
    # SURVEY.md §4.1): payloads are never decoded; verification degrades to
    # phash Hamming <= verify.sim_hamming_max. Metadata-only dry runs for
    # CI and 10^12-row capacity planning.
    simulation: bool = False
    seed: int = 0x5EED

    def config_hash(self) -> str:
        """Stable hash for checkpoint lineage (config change ⇒ new lineage)."""
        return hashlib.sha1(json.dumps(asdict(self), sort_keys=True).encode()).hexdigest()[:16]


# Named index presets mirroring init_index combos (index.c:28-126)
PRESETS: dict[str, EngineConfig] = {
    "default": EngineConfig(),
    # DDFS: exact index, uniform ratio 1 (all fingerprints) — exact dedup only
    "ddfs": EngineConfig(sampling=SamplingConfig("uniform", 1)),
    # Extreme Binning: file-defined segments, min sampling ratio 0 (1 feature/row)
    "extreme_binning": EngineConfig(sampling=SamplingConfig("min", 0)),
    # Sparse Index: content-defined segments, random sampling
    "sparse_index": EngineConfig(sampling=SamplingConfig("random", 64)),
    # SiLo: fixed segments, min sampling
    "silo": EngineConfig(sampling=SamplingConfig("min", 128)),
    # destor-parity champion selection in the flagship verify
    # (similarity_detection.c top-k with feature trim; k=2 is the
    # reference script default for segment prefetch)
    "champion": EngineConfig(lsh=LSHConfig(champion_top_k=2)),
    # + suffix-array substring fingerprints over captions (5th channel)
    "substring": EngineConfig(use_substring_channel=True),
    # pair-rendezvous verify: slim band shuffle + endpoint-keyed thumb
    # attach (the 10^12-row shuffle-volume configuration)
    "rendezvous": EngineConfig(lsh=LSHConfig(verify_mode="rendezvous")),
}
