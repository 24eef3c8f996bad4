"""Complete workloads. ``mechanic2d`` is the reference study's benchmark
problem (SalzmanA/fem-libraries), rebuilt TPU-natively end to end."""
