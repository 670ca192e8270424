"""CLI entry points mirroring the reference's train-*.py / test-*.py /
ROI-*.py scripts. Each module exposes main(argv) and is runnable as
`python -m ideal_gan_tpu.cli.<name>`."""
