"""End-to-end plans: raw zone → canonical events (the reference's
transform stage as one lazy Catalyst plan), dedup load."""
