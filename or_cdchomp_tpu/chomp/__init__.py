"""The CHOMP optimizer core: metric, costs, constraints, solver."""
