"""Custom operators Spark lacks natively, composed from DataFrame primitives."""
