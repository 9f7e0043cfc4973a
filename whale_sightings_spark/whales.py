"""Species dimension seed (reference ``whales.py:1-11``): the nine
whale species the pipeline fetches, keyed by CLI name."""

WHALE_NAMES: dict[str, dict[str, str]] = {
    "beluga_whale": {"scientificname": "Delphinapterus leucas"},
    "blue_whale": {"scientificname": "Balaenoptera musculus"},
    "bowhead_whale": {"scientificname": "Balaena mysticetus"},
    "fin_whale": {"scientificname": "Balaenoptera physalus"},
    "gray_whale": {"scientificname": "Eschrichtius robustus"},
    "humpback_whale": {"scientificname": "Megaptera novaeangliae"},
    "killer_whale": {"scientificname": "Orcinus orca"},
    "narwhal": {"scientificname": "Monodon monoceros"},
    "sperm_whale": {"scientificname": "Physeter macrocephalus"},
}

#: reverse lookup {scientific name -> Title Cased vernacular}
#: (reference storage.py:92-93)
SCIENTIFIC_TO_VERNACULAR: dict[str, str] = {
    v["scientificname"]: k.replace("_", " ").title() for k, v in WHALE_NAMES.items()
}
