"""Serving layer — the TPU-native analog of the reference's deployment
frontends (web/src TypeScript app + ios/ Swift app, SURVEY.md §2.6-2.7).

On TPU the deployment story inverts: instead of exporting the model to
ONNX/CoreML and re-implementing the CV pipeline per platform, clients
send frames to a server that owns the single fused perception graph and
the native solver; a browser page (static/scanner.html) plays the role
of the reference's camera web app against the HTTP API.
"""
