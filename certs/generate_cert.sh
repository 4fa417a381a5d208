#!/usr/bin/env bash
# Self-signed TLS certificate for local HTTPS serving (browser mic capture
# requires a secure context on non-localhost hosts).
set -euo pipefail
DIR="$(cd "$(dirname "$0")" && pwd)"
openssl req -x509 -newkey rsa:2048 -nodes \
  -keyout "$DIR/key.pem" -out "$DIR/cert.pem" -days 365 \
  -subj "/CN=sonicscribe-tpu.local"
echo "wrote $DIR/cert.pem and $DIR/key.pem"
echo "export USE_HTTPS=true SSL_CERTFILE=$DIR/cert.pem SSL_KEYFILE=$DIR/key.pem"
