"""User-facing applications (offline video, live stream, video stats)."""
