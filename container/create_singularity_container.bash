# create a Docker image
NAME=friendly-stable-audio-tools-tpu
docker build -t ${NAME} -f ./container/${NAME}.Dockerfile .

# convert a Docker image to a Singularity container (HPC TPU pods)
singularity build ${NAME}.sif docker-daemon://${NAME}
