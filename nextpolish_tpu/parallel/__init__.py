"""Device-mesh parallelism: window sharding + pileup-merge collectives."""
