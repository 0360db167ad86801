"""Device kernels and their host-side tensor builders."""
