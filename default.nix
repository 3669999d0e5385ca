# Dev shell (reference default.nix parity). The python deps come from
# pip/venv or the docker images; this provides the toolchain.
{ pkgs ? import <nixpkgs> { } }:

pkgs.mkShell {
  buildInputs = with pkgs; [
    python312
    gcc
    gnumake
    cmake
    ninja
    protobuf
  ];
  shellHook = ''
    export JAX_PLATFORMS=''${JAX_PLATFORMS:-cpu}
    make -C libreasr_tpu/native all || true
  '';
}
