#!/bin/sh
# Build + tag + push the job image (the reference's deploy-batch.sh
# ECR flow, msf_flow/deployment/deploy-batch.sh:1-35), registry-agnostic.
set -e
REGISTRY=${1:?usage: deploy.sh REGISTRY[/IMAGE] [TAG] [JAX_EXTRA]}
TAG=${2:-latest}
JAX_EXTRA=${3:-tpu}
HERE=$(dirname "$0")
docker build -f "$HERE/Dockerfile" --build-arg "JAX_EXTRA=$JAX_EXTRA" \
    -t "srcfinder-tpu:$TAG" "$HERE/.."
docker tag "srcfinder-tpu:$TAG" "$REGISTRY:$TAG"
docker push "$REGISTRY:$TAG"
