"""Data tooling CLIs (reference tools/ capability): cell extraction,
labeling, dataset organization, offline augmentation, statistics."""
