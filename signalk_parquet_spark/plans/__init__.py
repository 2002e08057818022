"""Query planning: PathSpec grammar → tier routing → federated DataFrame
assembly. This is the layer the reference implements in TypeScript as a
SQL-string generator; here it composes DataFrames and lets Catalyst plan."""
