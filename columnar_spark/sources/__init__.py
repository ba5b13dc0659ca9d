"""Source readers and the declared type system."""
