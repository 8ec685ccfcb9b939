"""Robot models: declarative kinematic trees, sphere collision models."""
