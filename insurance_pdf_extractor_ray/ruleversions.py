"""Versioned extraction rule tables (§2.11 of SURVEY.md).

Rebuilds the reference's prompt-version manager
(/root/reference/app/services/prompt_manager.py:14-132 over
config/prompts.yaml) for the deterministic extractor: instead of prompt
template versions, a *rule-table version* selects the label->field alias map
the extractor compiles in its actor ``__init__``.  The manager mirrors the
reference surface: get by version (default = latest configured), list
available versions, validate a version name, per-version info, cache +
reload, and user registration of new versions (the reference's analog is
editing prompts.yaml and hot-reloading).

The selected version is recorded on every output row (``rules_version``
column) and in checkpoint manifests, so a resumed run under a different rule
table re-extracts instead of silently mixing versions
(state/checkpoint.py: config-hash invalidation).
"""

from __future__ import annotations

from typing import Dict, List, Optional

from .config import LABEL_TO_FIELD

# ---------------------------------------------------------------------------
# Built-in versions
# ---------------------------------------------------------------------------

# v1: the baseline alias table (config.py LABEL_TO_FIELD), mirroring the
# reference's prompts.yaml v1 template field list.
_V1_LABELS: Dict[str, str] = dict(LABEL_TO_FIELD)

# v2: the "improved" release.  Adds aliases observed in carrier-specific
# quote formats, and *drops* the bare "address" alias — it is ambiguous in
# multi-party documents (broker / carrier mailing addresses match it too),
# so v2 only accepts the qualified form "insured address".  On documents
# that label the insured address with the bare form, v2 therefore yields
# EMPTY -> required-field validation failure: same corpus, different golden.
_V2_LABELS: Dict[str, str] = {
    k: v for k, v in _V1_LABELS.items() if k != "address"
}
_V2_LABELS.update({
    "policy number": "quote_number",
    "premium": "estimated_premium_amount",
    "total premium": "estimated_premium_amount",
    "underwriter": "issuing_carrier",
    "min earned premium": "minimum_earned_premium",
    "terrorism risk insurance act": "tria",
})

RULE_VERSIONS: Dict[str, Dict] = {
    "v1": {
        "description": "Baseline label aliases (reference prompts.yaml v1 field list)",
        "labels": _V1_LABELS,
    },
    "v2": {
        "description": ("Carrier-format aliases added; ambiguous bare 'address' "
                        "label dropped in favor of 'insured address'"),
        "labels": _V2_LABELS,
    },
}

DEFAULT_RULES_VERSION = "v1"

# Version tag recorded when the caller supplies an explicit label_map rather
# than a managed version.
CUSTOM_RULES_VERSION = "custom"


class RuleVersionManager:
    """Manages extraction rule-table versions (PromptManager analog,
    /root/reference/app/services/prompt_manager.py:14-132)."""

    def __init__(self, versions: Optional[Dict[str, Dict]] = None,
                 default_version: str = DEFAULT_RULES_VERSION):
        self._versions: Dict[str, Dict] = {
            k: {"description": v.get("description", ""), "labels": dict(v["labels"])}
            for k, v in (versions if versions is not None else RULE_VERSIONS).items()
        }
        self._default = default_version
        self._cache: Dict[str, Dict[str, str]] = {}

    # -- retrieval (get_prompt analog, prompt_manager.py:21-47) --------------
    def get_rules(self, version: Optional[str] = None) -> Dict[str, str]:
        """Label->field map for ``version`` (default version when None).

        Raises ``ValueError`` for unknown versions, like the reference's
        'Prompt version {version} not found'.
        """
        if version is None:
            version = self.get_default_version()
        cached = self._cache.get(version)
        if cached is not None:
            return cached
        if version not in self._versions:
            raise ValueError(f"Rule version {version} not found")
        rules = dict(self._versions[version]["labels"])
        self._cache[version] = rules
        return rules

    # -- listing / validation (prompt_manager.py:49-63,110-113) --------------
    def get_available_versions(self) -> List[str]:
        return sorted(self._versions)

    def get_default_version(self) -> str:
        return self._default

    def validate_rule_version(self, version: str) -> bool:
        return version in self._versions

    # -- metadata (get_prompt_info analog, prompt_manager.py:65-91) ----------
    def get_rule_info(self, version: Optional[str] = None) -> Dict:
        if version is None:
            version = self.get_default_version()
        cfg = self._versions.get(version)
        if cfg is None:
            return {"version": version, "error": f"Rule version {version} not found"}
        fields = sorted(set(cfg["labels"].values()))
        return {
            "version": version,
            "description": cfg["description"] or "No description available",
            "labels_count": len(cfg["labels"]),
            "fields_count": len(fields),
            "is_default": version == self._default,
        }

    # -- extension surface ----------------------------------------------------
    def register_version(self, version: str, labels: Dict[str, str],
                         description: str = "", make_default: bool = False) -> None:
        """User extension point: add (or replace) a rule-table version."""
        self._versions[version] = {"description": description, "labels": dict(labels)}
        self._cache.pop(version, None)
        if make_default:
            self._default = version

    # -- cache control (prompt_manager.py:115-132) ----------------------------
    def clear_cache(self) -> None:
        self._cache.clear()

    def reload(self) -> None:
        """Drop caches and re-seed built-ins (hot-reload analog).  User
        registrations are kept: reload refreshes built-in tables only."""
        self.clear_cache()
        for k, v in RULE_VERSIONS.items():
            self._versions.setdefault(k, {"description": v.get("description", ""),
                                          "labels": dict(v["labels"])})


# Module-level singleton, like the reference's lru_cache'd manager factory
# (prompt_manager.py get_prompt_manager).  Worker processes each build their
# own on import — cheap (plain dicts), no cross-process mutation expected.
rule_manager = RuleVersionManager()


def resolve_rules(label_map: Optional[Dict[str, str]] = None,
                  rules_version: Optional[str] = None,
                  version_tag: Optional[str] = None):
    """(label_map, version_tag) for the extractor constructor.

    Explicit ``label_map`` wins and is tagged 'custom' — unless
    ``version_tag`` names it (the driver-side resolution path: a pipeline
    resolves a possibly user-REGISTERED version on the driver and ships
    the materialized map + its version name to workers, since worker
    processes each hold their own ``rule_manager`` singleton and never see
    driver-side ``register_version`` calls).  Otherwise the managed version
    (default when None) is compiled from the local manager.
    """
    if label_map is not None:
        return dict(label_map), (version_tag or CUSTOM_RULES_VERSION)
    v = rules_version if rules_version is not None else rule_manager.get_default_version()
    return rule_manager.get_rules(v), v
