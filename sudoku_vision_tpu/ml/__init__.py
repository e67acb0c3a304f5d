"""ML stack: datasets, synthetic generation, training, eval, export."""
