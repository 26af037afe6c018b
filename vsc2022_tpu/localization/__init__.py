"""Temporal localization: TN alignment on device + host box conversion."""

from vsc2022_tpu.localization.localize import (  # noqa: F401
    Localization,
    LocalizationWithMetadata,
    TNLocalization,
    TNLocalizationCandidateScore,
    TNLocalizationMaxSim,
    VCSLLocalizationCandidateScore,
    VCSLLocalizationMaxSim,
)
