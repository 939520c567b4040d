"""Device-mesh parallelism: agent slices, ray sharding, collective exchange."""
